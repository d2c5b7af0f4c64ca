"""Regression tests for torch→JAX bridge aten lowerings that can
deviate from torch SILENTLY — each case here reproduced a real bug
(round-3 review): dtype-dropping `_to_copy`, left-aligned `expand`
-1 resolution, multi-axis `vector_norm` computed as a matrix norm,
fp32-coerced integer constants, and the dropout-rng dead end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from signal_tpu.torch_bridge import lower_torch_module  # noqa: E402


def _bridge_vs_torch(model, *example, rtol=1e-5, atol=1e-5, rng=None):
    model = model.eval() if rng is None else model.train()
    with torch.no_grad():
        ref = model(*example)
    bm = lower_torch_module(model, example)
    out = bm(*(jnp.asarray(t.numpy()) for t in example), rng=rng)
    if rng is None:
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   rtol=rtol, atol=atol)
    return bm, out


def test_to_copy_applies_dtype():
    """.to(int32) must truncate, not pass through (aten._to_copy)."""

    class M(torch.nn.Module):
        def forward(self, x):
            return x.to(torch.int32).to(torch.float32) * 2.0

    gen = torch.Generator().manual_seed(0)
    x = torch.randn(4, 3, generator=gen) * 3.0
    _bridge_vs_torch(M(), x)


def test_expand_minus_one_is_right_aligned():
    """expand(N, -1, ...) aligns -1 from the right; may add leading dims."""

    class M(torch.nn.Module):
        def forward(self, x):
            return x.expand(3, -1) + x.unsqueeze(0).expand(5, -1, -1).sum(0)

    x = torch.arange(6.0).reshape(1, 6)
    _bridge_vs_torch(M(), x)

    class M2(torch.nn.Module):
        def forward(self, x):                  # 2-D -> 3-D expand
            return x.unsqueeze(0).expand(4, -1, -1)

    _bridge_vs_torch(M2(), torch.randn(2, 5))


def test_vector_norm_multi_axis_is_vector_norm():
    """linalg.vector_norm over (2,3) flattens — NOT a spectral norm."""

    class M(torch.nn.Module):
        def forward(self, x):
            a = torch.linalg.vector_norm(x, dim=(2, 3), keepdim=True)
            b = torch.linalg.vector_norm(x, ord=1, dim=(1, 2))
            return x / (a + 1e-6) + b.sum() * 0
    gen = torch.Generator().manual_seed(1)
    _bridge_vs_torch(M(), torch.randn(2, 3, 4, 5, generator=gen))


def test_get_attr_integer_constants_survive():
    """Constant index tensors created in forward() keep their int dtype."""

    class M(torch.nn.Module):
        def forward(self, x):
            idx = torch.tensor([2, 0, 1])
            return x[:, idx]

    gen = torch.Generator().manual_seed(2)
    _bridge_vs_torch(M(), torch.randn(2, 3, 4, generator=gen))


def test_train_dropout_rng_passthrough():
    """A train-mode trace with dropout is callable with rng= (the old
    API raised 'pass rng=...' with no way to pass it)."""

    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = torch.nn.Linear(8, 8)

        def forward(self, x):
            return torch.nn.functional.dropout(self.lin(x), 0.5,
                                               self.training)

    m = M().train()
    x = torch.randn(16, 8, generator=torch.Generator().manual_seed(3))
    bm = lower_torch_module(m, (x,))
    with pytest.raises(ValueError, match="rng"):
        bm(jnp.asarray(x.numpy()))            # stochastic op, no key
    out = bm(jnp.asarray(x.numpy()), rng=jax.random.PRNGKey(0))
    out2 = bm(jnp.asarray(x.numpy()), rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # ~half the rows zeroed
    frac_zero = float(np.mean(np.asarray(out) == 0.0))
    assert 0.2 < frac_zero < 0.8


def test_bridge_is_torch_free_after_lowering():
    """The returned closure must not pin the example torch tensors."""
    import gc
    import weakref

    class M(torch.nn.Module):
        def forward(self, x):
            return x * 2.0

    x = torch.randn(2, 3)
    bm = lower_torch_module(M(), (x,))
    ref = weakref.ref(x)
    del x
    gc.collect()
    assert ref() is None, "example input still alive in fn's closure"
    np.testing.assert_allclose(np.asarray(bm(jnp.ones((2, 3)))),
                               np.full((2, 3), 2.0))


def test_zoo_state_dict_zero_match_raises(tmp_path):
    """A checkpoint that matches nothing must raise, not silently load
    random weights."""
    import os

    from signal_tpu.models.zoo import ZOO, build_zoo_backbone

    zoo_dir = "/root/reference/modeling/backbones/basic_cnn_params"
    if not os.path.isdir(zoo_dir):
        pytest.skip("reference checkout not present")
    name = "mobilenetv2_x1_0"
    assert name in ZOO
    bad = {"model.someprefix.weight": torch.zeros(1)}
    with pytest.raises(ValueError, match="matched 0"):
        build_zoo_backbone(name, zoo_dir=zoo_dir, num_classes=5,
                           batch_size=1, state_dict=bad)


def test_zoo_module_load_failure_not_cached(tmp_path):
    """exec_module failure must not leave a half-imported module cached."""
    import sys

    from signal_tpu.models.zoo import load_zoo_module

    bad = tmp_path / "brokennet.py"
    bad.write_text("import a_module_that_does_not_exist\n")
    with pytest.raises(ModuleNotFoundError):
        load_zoo_module(str(tmp_path), "brokennet.py")
    assert "signal_tpu_zoo_brokennet" not in sys.modules
    bad.write_text("FIXED = 1\n")
    mod = load_zoo_module(str(tmp_path), "brokennet.py")
    assert mod.FIXED == 1
