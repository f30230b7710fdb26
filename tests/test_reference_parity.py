"""Gold parity: identical weights, identical inputs -> identical charts
vs. the actual reference PyTorch implementation (/root/reference).

This is the end-to-end proof that (a) the checkpoint name mapping is
right and (b) the chart math matches the reference bit-for-bit-ish,
in one shot."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliora_tpu.chart.offsets import ncells
from cliora_tpu.models.config import ModelConfig
from cliora_tpu.models.params import init_diora_params
from cliora_tpu.ops.chart_pass import run_chart
from cliora_tpu.ops.core import unit_norm
from cliora_tpu.training.checkpoint import export_torch_checkpoint

D = 24


def _load_reference_diora(ckpt_path, share):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from cliora.net.diora import DioraMLP
    finally:
        sys.path.pop(0)
    ref = DioraMLP(D, outside=True, normalize="unit", compress=False,
                   share=share)
    blob = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    state = {k[len("diora."):]: v for k, v in blob["state_dict"].items()
             if k.startswith("diora.")}
    missing, unexpected = ref.load_state_dict(state, strict=False)
    assert not [m for m in missing if "leaf_fc" not in m or share], missing
    ref.eval()
    return ref, torch


@pytest.mark.parametrize("n,share", [(5, True), (8, True), (6, False)])
def test_charts_match_reference(n, share, rng):
    cfg = ModelConfig(size=D, share=share)
    dp = init_diora_params(jax.random.PRNGKey(7), cfg)
    ckpt = "/tmp/parity_ckpt.pt"
    export_torch_checkpoint(ckpt, {"diora": dp})
    ref, torch = _load_reference_diora(ckpt, share)

    B = 3
    x = rng.randn(B, n, D).astype(np.float32)

    with torch.no_grad():
        ref(torch.from_numpy(x), None)
    ref_ih = ref.inside_h.numpy()
    ref_is = ref.inside_s.numpy()
    ref_oh = ref.outside_h.numpy()
    ref_os = ref.outside_s.numpy()

    h0 = unit_norm(jnp.tanh(
        x @ dp["inside_compose"]["leaf_fc"]["w"].T
        + dp["inside_compose"]["leaf_fc"]["b"]))
    out = run_chart(cfg, dp, h0, outside=True)

    assert ref_ih.shape == (B, ncells(n), D)
    np.testing.assert_allclose(np.asarray(out.inside_h), ref_ih,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.inside_s), ref_is,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.outside_h), ref_oh,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.outside_s), ref_os,
                               atol=2e-4)


def test_cliora_charts_match_reference(rng):
    """CLIORA variant: visual residuals at leaves + every inside level."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from cliora.net.cliora import DioraMLP as ClioraMLP
    finally:
        sys.path.pop(0)

    n, B, R = 6, 2, 5
    cfg = ModelConfig(size=D, use_obj=True)
    dp = init_diora_params(jax.random.PRNGKey(8), cfg)
    ckpt = "/tmp/parity_cliora_ckpt.pt"
    export_torch_checkpoint(ckpt, {"diora": dp})

    ref = ClioraMLP(D, outside=True, normalize="unit", compress=False,
                    share=True)
    blob = torch.load(ckpt, map_location="cpu", weights_only=True)
    state = {k[len("diora."):]: v for k, v in blob["state_dict"].items()
             if k.startswith("diora.")}
    ref.load_state_dict(state, strict=False)
    ref.eval()  # disables the attention dropout

    x = rng.randn(B, n, D).astype(np.float32)
    obj = rng.randn(B, R, D).astype(np.float32)
    with torch.no_grad():
        ref(torch.from_numpy(x), torch.from_numpy(x),
            torch.from_numpy(obj), torch.from_numpy(obj))

    from cliora_tpu.models.diora import leaf_transform
    h0, _ = leaf_transform(cfg, dp, jnp.asarray(x),
                           obj_span=jnp.asarray(obj), train=False)
    out = run_chart(cfg, dp, h0, obj=jnp.asarray(obj), train=False,
                    outside=True)
    np.testing.assert_allclose(np.asarray(out.inside_h),
                               ref.inside_h.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.outside_h),
                               ref.outside_h.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.inside_s),
                               ref.inside_s.numpy(), atol=2e-4)
