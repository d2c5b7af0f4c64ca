"""Parity tests against the ACTUAL reference modules, imported from
`/root/reference` and run on CPU torch with weights copied from the JAX
pytrees — strictly stronger evidence than the hand-transcribed torch
re-implementations in test_sim_parity.py / test_align_parity.py (those
could encode the same misreading twice).

Covers: SIM (`modeling/AddModule/useA.py`), GAM+LAM (`useB.py` + `DAS.py`),
batch-hard triplet (`layers/triplet_loss.py`), k-reciprocal re-ranking
(`utils/reranking.py`).
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref():
    """Load the reference modules directly by file path, registering stub
    parent packages so `modeling/__init__.py` (which imports timm, absent
    here) never executes. The modules' own absolute imports
    (`from utils.volume import …`, `from modeling.AddModule.DAS import …`)
    resolve through the stubs' __path__."""
    import importlib.util
    import types

    for pkg, sub in (("modeling", "modeling"),
                     ("modeling.AddModule", "modeling/AddModule"),
                     ("utils", "utils"), ("layers", "layers")):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [os.path.join(REFERENCE, sub)]
            sys.modules[pkg] = m

    def load(name, relpath):
        if name in sys.modules:
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REFERENCE, relpath))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("utils.volume", "utils/volume.py")
    das_mod = load("modeling.AddModule.DAS", "modeling/AddModule/DAS.py")
    useA = load("modeling.AddModule.useA", "modeling/AddModule/useA.py")
    useB = load("modeling.AddModule.useB", "modeling/AddModule/useB.py")
    tl = load("layers.triplet_loss", "layers/triplet_loss.py")
    rr = load("utils.reranking", "utils/reranking.py")
    return {"useA": useA, "useB": useB, "DAS": das_mod,
            "triplet": tl, "reranking": rr}


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _set(mod_param, arr):
    with torch.no_grad():
        mod_param.copy_(_t(arr))


# --------------------------------------------------------------------------
# SIM
# --------------------------------------------------------------------------

@pytest.mark.parametrize("keep_ratio", [None, 0.75])
def test_sim_forward_matches_reference_module(ref, keep_ratio):
    import jax
    import jax.numpy as jnp

    from signal_tpu.models.sim import init_sim_params, sim_forward

    dim, L, B, k = 64, 32, 6, 5
    params = init_sim_params(jax.random.PRNGKey(0), dim)

    m = ref["useA"].Select_Interactive_Module(dim, k=k, keep_ratio=keep_ratio)
    m.eval()
    sel, inter = m.token_selection, m.modal_interactive
    # selection projections (W_v exists but is unused, `useA.py:48`)
    for name in ("W_q", "W_k", "W_v"):
        _set(getattr(sel, name).weight, np.asarray(params["select"][name]["kernel"]).T)
        _set(getattr(sel, name).bias, params["select"][name]["bias"])
    # MHCA: packed in_proj == qkv_kernel.T
    ca = params["interact"]["cross_attn"]
    _set(inter.cross_attn.in_proj_weight, np.asarray(ca["qkv_kernel"]).T)
    _set(inter.cross_attn.in_proj_bias, ca["qkv_bias"])
    _set(inter.cross_attn.out_proj.weight, np.asarray(ca["out_kernel"]).T)
    _set(inter.cross_attn.out_proj.bias, ca["out_bias"])
    ffn = params["interact"]["ffn"]
    _set(inter.ffn[0].weight, np.asarray(ffn["fc1"]["kernel"]).T)
    _set(inter.ffn[0].bias, ffn["fc1"]["bias"])
    _set(inter.ffn[2].weight, np.asarray(ffn["fc2"]["kernel"]).T)
    _set(inter.ffn[2].bias, ffn["fc2"]["bias"])
    for i, norm in enumerate((inter.norm1, inter.norm2), 1):
        _set(norm.weight, params["interact"][f"norm{i}"]["scale"])
        _set(norm.bias, params["interact"][f"norm{i}"]["bias"])

    rng = np.random.default_rng(3)
    patches = rng.standard_normal((B, 3, L, dim)).astype(np.float32)
    cls = rng.standard_normal((B, 3, dim)).astype(np.float32)

    with torch.no_grad():
        out_ref = m(_t(patches[:, 0]), _t(patches[:, 1]), _t(patches[:, 2]),
                    _t(cls[:, 0]), _t(cls[:, 1]), _t(cls[:, 2])).numpy()

    out_jax, _ = sim_forward(params, jnp.asarray(patches), jnp.asarray(cls),
                             k=k, keep_ratio=keep_ratio,
                             compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_jax), out_ref,
                               rtol=2e-4, atol=2e-4)


# --------------------------------------------------------------------------
# GAM + LAM (AlignmentM with the real DAS modules)
# --------------------------------------------------------------------------

def _copy_das(torch_das, jax_das):
    seq = torch_das.conv_offset
    # JAX HWIO [k,k,I,O] → torch OIHW [O,I,k,k]
    oihw = lambda a: np.asarray(a).transpose(3, 2, 0, 1)  # noqa: E731
    _set(seq[0].weight, oihw(jax_das["off_conv1"]["kernel"]))
    _set(seq[0].bias, jax_das["off_conv1"]["bias"])
    _set(seq[2].weight, oihw(jax_das["off_dw"]["kernel"]))
    _set(seq[2].bias, jax_das["off_dw"]["bias"])
    _set(seq[4].weight, oihw(jax_das["off_out"]["kernel"]))
    _set(torch_das.proj_q.weight, oihw(jax_das["proj_q"]["kernel"]))
    _set(torch_das.proj_q.bias, jax_das["proj_q"]["bias"])


def test_alignment_forward_matches_reference_module(ref):
    import jax
    import jax.numpy as jnp

    from signal_tpu.models.align import align_forward, init_align_params

    # the reference hardcodes n_head_channels=512 inside AlignmentM
    # (`useB.py:60-73`), so parity must run at the real feature dim
    dim, h, w, B = 512, 8, 8, 3
    params = init_align_params(jax.random.PRNGKey(1), dim)

    m = ref["useB"].AlignmentM(dim, h, w)
    m.eval()
    _set(m.contra_temp, params["contra_temp"])
    _copy_das(m.DAS_r, params["DAS_r"])
    _copy_das(m.DAS_n, params["DAS_n"])
    _copy_das(m.DAS_t, params["DAS_t"])

    rng = np.random.default_rng(7)
    patches = rng.standard_normal((B, 3, h * w, dim)).astype(np.float32)

    with torch.no_grad():
        gam_ref, lam_ref = m(_t(patches[:, 0]), _t(patches[:, 1]),
                             _t(patches[:, 2]), "together_CLS_Patch")
        gam_only = m(_t(patches[:, 0]), _t(patches[:, 1]), _t(patches[:, 2]),
                     "CLS")

    gam, lam = align_forward(params, jnp.asarray(patches), h=h, w=w,
                             stage="together_CLS_Patch")
    np.testing.assert_allclose(float(gam), float(gam_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(lam), float(lam_ref), rtol=1e-4, atol=1e-6)
    gam2, lam2 = align_forward(params, jnp.asarray(patches), h=h, w=w,
                               stage="CLS")
    assert lam2 is None
    np.testing.assert_allclose(float(gam2), float(gam_only), rtol=1e-4, atol=1e-5)


def test_das_sampling_matches_reference_module(ref):
    import jax
    import jax.numpy as jnp

    from signal_tpu.models.align import das_forward, init_das_params

    C, H, W, B = 512, 16, 8, 2
    params = init_das_params(jax.random.PRNGKey(2), C)
    # reference ctor args (`useB.py:60-73`): n_heads=1, ch=512, groups=1,
    # stride=4, offset_range_factor=2, ksize=4
    m = ref["DAS"].DA_sample(1, C, 1, 4, 2, 4)
    m.eval()
    _copy_das(m, params)

    rng = np.random.default_rng(11)
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    with torch.no_grad():
        out_ref = m(_t(x)).numpy()
    out = das_forward(params, jnp.asarray(x))
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# Triplet loss
# --------------------------------------------------------------------------

@pytest.mark.parametrize("margin", [None, 0.3])
def test_triplet_matches_reference_module(ref, margin):
    import jax.numpy as jnp

    from signal_tpu.losses import triplet_loss

    rng = np.random.default_rng(5)
    feats = rng.standard_normal((16, 32)).astype(np.float32)
    # PK structure (4 ids × 4 instances): the reference miner hard-requires
    # equal instance counts per id (`triplet_loss.py:61-79`)
    labels = np.repeat(np.arange(4), 4)

    tri = ref["triplet"].TripletLoss(margin) if margin is not None \
        else ref["triplet"].TripletLoss()
    with torch.no_grad():
        loss_ref = tri(_t(feats), torch.from_numpy(labels))[0].item()

    loss, _, _ = triplet_loss(jnp.asarray(feats), jnp.asarray(labels),
                              margin=margin)
    np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------------
# Re-ranking
# --------------------------------------------------------------------------

def test_reranking_matches_reference_module(ref):
    import jax.numpy as jnp

    from signal_tpu.reranking import re_ranking

    rng = np.random.default_rng(9)
    # clustered features so k-reciprocal sets are non-trivial
    centers = rng.standard_normal((6, 24)).astype(np.float32)
    qf = (centers[rng.integers(0, 6, 20)] + 0.1 * rng.standard_normal((20, 24))
          ).astype(np.float32)
    gf = (centers[rng.integers(0, 6, 50)] + 0.1 * rng.standard_normal((50, 24))
          ).astype(np.float32)

    d_ref = ref["reranking"].re_ranking(_t(qf), _t(gf), k1=8, k2=3,
                                        lambda_value=0.3)
    d_jax = np.asarray(re_ranking(jnp.asarray(qf), jnp.asarray(gf),
                                  k1=8, k2=3, lambda_value=0.3))
    assert d_jax.shape == d_ref.shape
    # documented as not bit-exact (fp32 vs fp16 accumulations in the
    # original); the induced rankings must agree
    order_ref = np.argsort(d_ref, axis=1)
    order_jax = np.argsort(d_jax, axis=1)
    top5_agree = np.mean([
        len(set(order_ref[i, :5]) & set(order_jax[i, :5])) / 5.0
        for i in range(d_ref.shape[0])])
    assert top5_agree >= 0.95, f"top-5 rank agreement {top5_agree:.3f}"
    np.testing.assert_allclose(d_jax, d_ref, rtol=0.05, atol=0.01)
