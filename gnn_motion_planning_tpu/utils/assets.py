"""Asset resolution for problem datasets, checkpoints, and robot models.

Assets keep the reference's relative-path layout (``maze_files/*.npz``,
``data/weights/*.pt``, ``kuka_iiwa/*.urdf`` — reference: maze_env.py:21,
str2name.py:15-66) so user-facing names are unchanged. Resolution order:
``$GMP_ASSETS`` env var, the in-repo ``assets/`` tree, then a reference
checkout if present.
"""

from __future__ import annotations

import os
from pathlib import Path

_REPO_ASSETS = Path(__file__).resolve().parents[2] / "assets"
_FALLBACKS = [Path("/root/reference")]


def asset_path(relpath: str) -> str:
    """Resolve a reference-style relative asset path to an absolute path."""

    candidates = []
    env_root = os.environ.get("GMP_ASSETS")
    if env_root:
        candidates.append(Path(env_root) / relpath)
    candidates.append(_REPO_ASSETS / relpath)
    # weights live under data/weights in the reference layout
    candidates.extend(root / relpath for root in _FALLBACKS)
    for cand in candidates:
        if cand.exists():
            return str(cand)
    raise FileNotFoundError(
        f"asset {relpath!r} not found (searched {[str(c) for c in candidates]}); "
        "set GMP_ASSETS or regenerate via tools/ (some reference datasets are "
        "missing upstream — see SURVEY.md §2.2)"
    )
