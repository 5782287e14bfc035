"""Self-contained converter/inference parity against the committed golden
checkpoint (tests/fixtures/ — generated once from the reference classes by
make_golden.py; see VERDICT round 1, missing item 4).

These tests run WITHOUT /root/reference mounted: the fixture freezes a
reference-format state_dict plus the reference model's eval-mode outputs, so
checkpoint-conversion parity (models/convert.py) and the main_test-style
inference path stay pinned even when the reference tree is gone.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pointnetgpd_tpu.models.convert import convert_state_dict
from pointnetgpd_tpu.models.pointnet import apply_pointnet_cls

HERE = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(HERE, "fixtures", "golden_pointnet_3class.npz")
IO = os.path.join(HERE, "fixtures", "golden_io.npz")

ATOL = 1e-4


@pytest.fixture(scope="module")
def golden():
    sd = dict(np.load(CKPT))
    params, state = convert_state_dict(sd)
    io = np.load(IO)
    return params, state, io


def test_converter_parity_vs_frozen_logits(golden):
    """convert_state_dict(golden) must reproduce the torch eval outputs the
    fixture froze (log_softmax logits + STN trans) to fp32 tolerance —
    the north-star parity gate, now reference-independent."""
    params, state, io = golden
    x = jnp.asarray(io["x"]).swapaxes(1, 2)        # (B, C, N) -> (B, N, C)
    (logp, trans), _ = apply_pointnet_cls(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(trans), io["trans"], atol=ATOL)
    np.testing.assert_allclose(np.asarray(logp), io["logp"], atol=ATOL)


def test_export_round_trips_the_golden_state_dict(golden):
    """export_torch_state_dict inverts the conversion back to the original
    reference key names and layouts."""
    from pointnetgpd_tpu.models.convert import export_torch_state_dict

    params, state, _ = golden
    sd_orig = dict(np.load(CKPT))
    sd_back = export_torch_state_dict(params, state)
    want = {k: v for k, v in sd_orig.items()
            if not k.endswith("num_batches_tracked")}
    assert set(sd_back) == set(want)
    for k in want:
        got = sd_back[k]
        got = got.detach().cpu().numpy() if hasattr(got, "detach") else np.asarray(got)
        np.testing.assert_allclose(got, want[k], atol=1e-6, err_msg=k)


def test_scorer_runs_golden_checkpoint_end_to_end(golden):
    """main_test-equivalent path: GraspScorer drives the converted golden
    checkpoint over a scene of candidates (batched, softmax-on-log_softmax
    quirk, vote+rank) and returns sane rankings."""
    from pointnetgpd_tpu.inference.scorer import GraspScorer

    params, state, _ = golden
    scorer = GraspScorer(params=params, state=state, k=3, num_points=500,
                         min_points=5)
    rng = np.random.RandomState(0)
    pc = (rng.rand(4096, 3) * 0.08).astype(np.float32)
    n_cand = 17
    cands = np.zeros((n_cand, 5, 3), np.float32)
    cands[:, 0] = rng.rand(n_cand, 3) * 0.08
    cands[:, 1] = [1, 0, 0]
    cands[:, 2] = [0, 1, 0]
    cands[:, 3] = [0, 0, 1]
    out = scorer.score_candidates(pc, cands, hand_depth=0.05, width=0.08)
    assert out["pred"].shape == (n_cand,)
    assert np.isfinite(np.asarray(out["prob"], np.float32)).all()
    probs = np.asarray(out["prob"], np.float32)
    np.testing.assert_allclose(probs[np.asarray(out["valid"])].sum(-1), 1.0,
                               atol=1e-3)
