"""Serialized job-chain runner with per-step artifact verification.

Replaces the per-round one-off chain_r*.sh scripts (round-3 and round-4
both lost queued work to silent step failures — empty train-log dirs,
"refresh pending" rows). Every step declares the artifact(s) it must
produce; a step only counts as done when its command exits 0 AND every
artifact exists with an mtime newer than the step's start. Failures are
recorded and the chain continues (steps are independent jobs), but the
runner exits non-zero and the summary JSON names every failed step, so
nothing silently doesn't-run again.

Job spec: a JSON list of steps
  [{"name": "...", "cmd": "shell command", "timeout": 4500,
    "artifacts": ["path", ...], "env": {"K": "V"}?,
    "skip_if_exists": true?}, ...]

"skip_if_exists": skip the step (status "skipped") when every declared
artifact already exists — for specs that re-queue work another chain may
have finished first (deduplication across re-prioritized chains).

Usage:  python tools/chain.py <spec.json> [--summary out.json]
Status: tail -f <spec>.log ; summary written next to the spec by default.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_chain(spec_path: Path, summary_path: Path | None = None) -> int:
    steps = json.loads(spec_path.read_text())
    log_path = spec_path.with_suffix(spec_path.suffix + ".log")
    summary_path = summary_path or spec_path.with_suffix(".summary.json")
    results = []

    def log(msg: str):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        with log_path.open("a") as f:
            f.write(line + "\n")

    log(f"chain start: {spec_path} ({len(steps)} steps)")
    for i, step in enumerate(steps):
        name = step.get("name", f"step{i}")
        cmd = step["cmd"]
        timeout = step.get("timeout", 3600)
        artifacts = [REPO / a for a in step.get("artifacts", [])]
        t0 = time.time()
        if step.get("skip_if_exists") and artifacts and all(
            a.exists() for a in artifacts
        ):
            log(f"step {i + 1}/{len(steps)} [{name}] skipped: artifacts exist")
            results.append(
                {"name": name, "status": "skipped", "wall_s": 0.0,
                 "detail": "artifacts already exist", "cmd": cmd}
            )
            summary_path.write_text(json.dumps(
                {"spec": str(spec_path), "done": i + 1, "total": len(steps),
                 "steps": results}, indent=1))
            continue
        log(f"step {i + 1}/{len(steps)} [{name}] start: {cmd}")
        env = dict(os.environ)
        env.update(step.get("env", {}))
        status = "ok"
        detail = ""
        try:
            with log_path.open("a") as lf:
                proc = subprocess.run(
                    cmd, shell=True, cwd=REPO, env=env, timeout=timeout,
                    stdout=lf, stderr=subprocess.STDOUT,
                )
            if proc.returncode != 0:
                status = "failed"
                detail = f"exit {proc.returncode}"
        except subprocess.TimeoutExpired:
            status = "timeout"
            detail = f"killed after {timeout}s"
        if status == "ok":
            missing = [
                str(a) for a in artifacts
                if not a.exists() or a.stat().st_mtime < t0 - 1
            ]
            if missing:
                status = "no_artifact"
                detail = f"missing/stale: {missing}"
        wall = round(time.time() - t0, 1)
        log(f"step [{name}] {status} in {wall}s {detail}")
        results.append(
            {"name": name, "status": status, "wall_s": wall,
             "detail": detail, "cmd": cmd}
        )
        summary_path.write_text(json.dumps(
            {"spec": str(spec_path), "done": i + 1, "total": len(steps),
             "steps": results}, indent=1))
    n_bad = sum(r["status"] not in ("ok", "skipped") for r in results)
    log(f"chain done: {len(steps) - n_bad}/{len(steps)} ok")
    return 1 if n_bad else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    summary = None
    if "--summary" in sys.argv:
        summary = Path(sys.argv[sys.argv.index("--summary") + 1])
    sys.exit(run_chain(Path(args[0]), summary))
