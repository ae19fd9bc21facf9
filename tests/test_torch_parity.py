"""Numerical parity of functional layers vs torch with converted weights.

The shipped checkpoints must reproduce reference numerics; these tests pin
the layer-level semantics (torch layouts, eps values, eval-mode BN) using
the actual converted weights from data/weights/*.pt.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gnn_motion_planning_tpu.models.convert import load_params
from gnn_motion_planning_tpu.models.mlp import batch_norm_eval, layer_norm, linear, mlp2


@pytest.fixture(scope="module")
def maze_params():
    return load_params("data/weights/weights_maze.pt")


def test_linear_and_mlp_match_torch(maze_params):
    p = maze_params["node_code"]
    x = np.random.RandomState(0).randn(17, 8).astype(np.float32)

    lin0 = torch.nn.Linear(8, 32)
    lin0.weight.data = torch.tensor(p["0"]["weight"])
    lin0.bias.data = torch.tensor(p["0"]["bias"])
    lin2 = torch.nn.Linear(32, 32)
    lin2.weight.data = torch.tensor(p["2"]["weight"])
    lin2.bias.data = torch.tensor(p["2"]["bias"])
    want = lin2(torch.relu(lin0(torch.tensor(x)))).detach().numpy()

    got = np.asarray(mlp2(p, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_layer_norm_matches_torch(maze_params):
    p = maze_params["node_attentions"]["0"]["attention"]["layer_norm"]
    x = np.random.RandomState(1).randn(9, 32).astype(np.float32)
    ln = torch.nn.LayerNorm(32, eps=1e-6)
    ln.weight.data = torch.tensor(p["weight"])
    ln.bias.data = torch.tensor(p["bias"])
    want = ln(torch.tensor(x)).detach().numpy()
    got = np.asarray(layer_norm(p, x, eps=1e-6))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batch_norm_eval_matches_torch():
    smooth = load_params("data/weights/smooth_2d_attv3.pt")
    p = smooth["node_code"]["1"]
    x = np.random.RandomState(2).randn(11, 128).astype(np.float32)
    bn = torch.nn.BatchNorm1d(128)
    bn.weight.data = torch.tensor(p["weight"])
    bn.bias.data = torch.tensor(p["bias"])
    bn.running_mean.data = torch.tensor(p["running_mean"])
    bn.running_var.data = torch.tensor(p["running_var"])
    bn.eval()
    want = bn(torch.tensor(x)).detach().numpy()
    got = np.asarray(batch_norm_eval(p, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_segment_max_matches_torch_scatter_semantics():
    """Max aggregation over incoming edges == torch scatter_reduce amax."""

    import jax.numpy as jnp

    from gnn_motion_planning_tpu.ops.segment import masked_segment_max

    rng = np.random.RandomState(3)
    e, n, f = 64, 10, 8
    msg = rng.randn(e, f).astype(np.float32)
    dst = rng.randint(0, n, e)
    # ensure every node receives at least one message (self-loops in practice)
    dst[:n] = np.arange(n)

    got = np.asarray(
        masked_segment_max(jnp.asarray(msg), jnp.asarray(dst), jnp.ones(e, bool), n)
    )
    want = torch.full((n, f), -torch.inf).scatter_reduce(
        0, torch.tensor(dst)[:, None].expand(e, f), torch.tensor(msg), "amax"
    )
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-6)


def test_lstm_cell_matches_torch():
    from gnn_motion_planning_tpu.models.next_model import _lstm_cell

    rng = np.random.RandomState(4)
    in_dim, h_dim, b = 12, 16, 5
    cell = torch.nn.LSTMCell(in_dim, h_dim)
    p = {
        "weight_ih": cell.weight_ih.detach().numpy(),
        "weight_hh": cell.weight_hh.detach().numpy(),
        "bias_ih": cell.bias_ih.detach().numpy(),
        "bias_hh": cell.bias_hh.detach().numpy(),
    }
    x = rng.randn(b, in_dim).astype(np.float32)
    h = rng.randn(b, h_dim).astype(np.float32)
    c = rng.randn(b, h_dim).astype(np.float32)
    want_h, want_c = cell(torch.tensor(x), (torch.tensor(h), torch.tensor(c)))
    got_h, got_c = _lstm_cell(p, x, h, c)
    np.testing.assert_allclose(np.asarray(got_h), want_h.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), want_c.detach().numpy(), rtol=1e-4, atol=1e-5)
