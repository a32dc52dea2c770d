"""Shape/dtype/init tests for the Burgess VAE stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disvae_tpu.models.vae import VAE, init_specific_model
from disvae_tpu.models.discriminator import Discriminator


@pytest.mark.parametrize("img_size", [(1, 32, 32), (3, 64, 64)])
def test_forward_shapes(rng_key, img_size):
    model, params = init_specific_model("Burgess", img_size, 10, key=rng_key)
    c, h, w = img_size
    x = jnp.zeros((4, h, w, c))
    recon, (mu, logvar), z = model.apply(params, x,
                                         jax.random.PRNGKey(1), is_train=True)
    assert recon.shape == (4, h, w, c)
    assert mu.shape == (4, 10) and logvar.shape == (4, 10)
    assert z.shape == (4, 10)
    assert np.all(np.asarray(recon) >= 0) and np.all(np.asarray(recon) <= 1)


def test_64_has_extra_conv(rng_key):
    _, p32 = init_specific_model("Burgess", (1, 32, 32), 10, key=rng_key)
    _, p64 = init_specific_model("Burgess", (1, 64, 64), 10, key=rng_key)
    assert "conv_64" not in p32["encoder"] and "conv_64" in p64["encoder"]
    assert "convT_64" not in p32["decoder"] and "convT_64" in p64["decoder"]


def test_invalid_img_size():
    with pytest.raises(RuntimeError):
        VAE(img_size=(1, 16, 16), latent_dim=10)


def test_invalid_model_type():
    with pytest.raises(ValueError):
        init_specific_model("NotAModel", (1, 32, 32), 10)


def test_eval_reparam_is_mean(rng_key):
    model, params = init_specific_model("Burgess", (1, 32, 32), 10,
                                        key=rng_key)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 1))
    mu, logvar = model.encode(params, x)
    z_eval = model.reparameterize(mu, logvar, jax.random.PRNGKey(3),
                                  is_train=False)
    assert np.allclose(np.asarray(z_eval), np.asarray(mu))
    z_train = model.reparameterize(mu, logvar, jax.random.PRNGKey(3),
                                   is_train=True)
    assert not np.allclose(np.asarray(z_train), np.asarray(mu))


def test_reparam_distribution(rng_key):
    """z = mu + sigma*eps: check empirical moments."""
    model = VAE(img_size=(1, 32, 32), latent_dim=10)
    mu = jnp.full((20000, 10), 2.0)
    logvar = jnp.full((20000, 10), jnp.log(4.0))
    z = model.reparameterize(mu, logvar, jax.random.PRNGKey(0), is_train=True)
    z = np.asarray(z)
    assert abs(z.mean() - 2.0) < 0.02
    assert abs(z.std() - 2.0) < 0.02


def test_init_matches_torch_bounds(rng_key):
    """Kaiming-uniform relu bounds: |w| <= sqrt(6/fan_in), and the empirical
    std is near the uniform's sqrt(2/fan_in)."""
    _, params = init_specific_model("Burgess", (1, 32, 32), 10, key=rng_key)
    w = np.asarray(params["encoder"]["conv2"]["w"])  # (4,4,32,32)
    fan_in = 32 * 16
    bound = np.sqrt(6.0 / fan_in)
    assert np.abs(w).max() <= bound
    assert abs(w.std() - bound / np.sqrt(3)) < 0.005
    # linear
    wl = np.asarray(params["encoder"]["lin1"]["w"])  # (512, 256)
    bound_l = np.sqrt(6.0 / 512)
    assert np.abs(wl).max() <= bound_l
    # convT fan-in uses OUT channels (torch quirk)
    wt = np.asarray(params["decoder"]["convT3"]["w"])  # (4,4,32,1)
    bound_t = np.sqrt(6.0 / (1 * 16))
    assert np.abs(wt).max() <= bound_t
    assert np.abs(wt).max() > bound_t * 0.9  # actually fills the range


def test_discriminator(rng_key):
    disc = Discriminator(latent_dim=10)
    params = disc.init(rng_key)
    out = disc.apply(params, jnp.zeros((6, 10)))
    assert out.shape == (6, 2)
    assert len(params) == 6
    assert params["lin2"]["w"].shape == (1000, 1000)


def test_n_params(rng_key):
    """Parameter count must equal the torch reference's Burgess VAE."""
    from disvae_tpu.utils.helpers import get_n_param
    _, params = init_specific_model("Burgess", (1, 32, 32), 10, key=rng_key)
    # torch: conv stack + fcs, mnist 32x32 => 469,173 params... compute
    # independently: encoder convs 3*(32*prev*16+32), fcs.
    def conv_p(cin, cout):
        return cout * cin * 16 + cout

    expected = (conv_p(1, 32) + conv_p(32, 32) + conv_p(32, 32)
                + (512 * 256 + 256) + (256 * 256 + 256)
                + (256 * 20 + 20)
                + (10 * 256 + 256) + (256 * 256 + 256) + (256 * 512 + 512)
                + conv_p(32, 32) + conv_p(32, 32) + conv_p(32, 1))
    assert get_n_param(params) == expected


def test_bfloat16_compute_dtype_close_to_f32():
    """The bf16 compute path must stay close to the f32 forward (params and
    heads are f32 in both)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from disvae_tpu.models.vae import init_specific_model

    model32, params = init_specific_model("Burgess", (3, 64, 64), 10,
                                          key=jax.random.PRNGKey(0))
    model16 = init_specific_model("Burgess", (3, 64, 64), 10,
                                  compute_dtype="bfloat16")
    x = jnp.asarray(np.random.RandomState(0).rand(4, 64, 64, 3),
                    jnp.float32)
    r32, (m32, l32), _ = model32.apply(params, x, is_train=False)
    r16, (m16, l16), _ = model16.apply(params, x, is_train=False)
    assert r16.dtype == jnp.float32 and m16.dtype == jnp.float32
    assert np.abs(np.asarray(r32) - np.asarray(r16)).max() < 0.05
    assert np.abs(np.asarray(m32) - np.asarray(m16)).max() < 0.05


def test_packed_convT_matches_dilated():
    """conv2d_transpose_packed (polyphase k3 + depth-to-space, full-MXU
    formulation) is tap-level identical to the input-dilated conv2d_transpose
    for the Burgess k4 s2 p1 shape."""
    import numpy as np
    from disvae_tpu.ops.convs import (conv2d_transpose,
                                      conv2d_transpose_packed)
    rng = np.random.RandomState(0)
    for h, cin, cout in [(4, 32, 32), (16, 32, 1), (8, 32, 3)]:
        x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(4, 4, cin, cout).astype(np.float32))
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        y0 = conv2d_transpose(x, w, b)
        y1 = conv2d_transpose_packed(x, w, b)
        assert y0.shape == y1.shape == (2, 2 * h, 2 * h, cout)
        assert float(jnp.max(jnp.abs(y0 - y1))) < 1e-4


def test_convT_mxu_custom_vjp_matches_xla_grads():
    """conv2d_transpose_mxu's hand-written backward (polyphase-packed weight
    grad + adjoint-conv input grad) equals XLA's autodiff of the dilated
    conv2d_transpose up to f32 reassociation, for every (x, w, b) grad and
    both decoder-final shapes (grayscale and RGB). Forward is the same code
    path so it is bitwise identical by construction."""
    import numpy as np
    from disvae_tpu.ops.convs import conv2d_transpose, conv2d_transpose_mxu
    rng = np.random.RandomState(1)
    for h, cin, cout in [(16, 32, 1), (16, 32, 3), (4, 8, 5)]:
        x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(4, 4, cin, cout).astype(np.float32))
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        # random cotangent so every dy element (incl. boundary rows the
        # tap shifts zero out) is exercised
        t = jnp.asarray(rng.randn(2, 2 * h, 2 * h, cout).astype(np.float32))

        def loss(op):
            return lambda x, w, b: jnp.sum(op(x, w, b) * t)

        y0 = conv2d_transpose(x, w, b)
        y1 = conv2d_transpose_mxu(x, w, b)
        assert float(jnp.max(jnp.abs(y0 - y1))) == 0.0
        g_ref = jax.grad(loss(conv2d_transpose), argnums=(0, 1, 2))(x, w, b)
        g_mxu = jax.grad(loss(conv2d_transpose_mxu), argnums=(0, 1, 2))(x, w, b)
        for gr, gm, name in zip(g_ref, g_mxu, "xwb"):
            scale = float(jnp.max(jnp.abs(gr))) + 1e-30
            err = float(jnp.max(jnp.abs(gr - gm))) / scale
            assert err < 1e-5, (name, h, cin, cout, err)


def test_convT_pc_phase_conv_dw_exact():
    """_phase_conv_dw (space-to-depth'd dy + 2x2-window grad-conv, the
    phase-conv weight-grad formulation behind conv2d_transpose_pc) run in
    f32 equals XLA's autodiff dW to f32-reassociation tolerance on every
    decoder-final shape, including odd Cout and tiny spatial dims."""
    import numpy as np
    from disvae_tpu.ops.convs import _phase_conv_dw, conv2d_transpose
    rng = np.random.RandomState(3)
    for h, cin, cout in [(16, 32, 1), (16, 32, 3), (4, 8, 5), (2, 2, 2)]:
        x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(4, 4, cin, cout).astype(np.float32))
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        t = jnp.asarray(rng.randn(2, 2 * h, 2 * h, cout).astype(np.float32))
        g_ref = jax.grad(
            lambda x, w, b: jnp.sum(conv2d_transpose(x, w, b) * t),
            argnums=1)(x, w, b)
        g_pc = _phase_conv_dw(x, t, jnp.float32)
        scale = float(jnp.max(jnp.abs(g_ref))) + 1e-30
        err = float(jnp.max(jnp.abs(g_ref - g_pc))) / scale
        assert err < 1e-5, (h, cin, cout, err)


def test_convT_pc_parity_policy_grads_identical():
    """Under parity policies (tests run at `highest`) conv2d_transpose_pc's
    backward emits the EXACT primitives jax's autodiff emits — all three
    grads must match the autodiff reference bitwise."""
    import numpy as np
    from disvae_tpu.ops.convs import conv2d_transpose, conv2d_transpose_pc
    rng = np.random.RandomState(4)
    for h, cin, cout in [(16, 32, 1), (16, 32, 3), (4, 8, 5)]:
        x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(4, 4, cin, cout).astype(np.float32))
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        t = jnp.asarray(rng.randn(2, 2 * h, 2 * h, cout).astype(np.float32))

        def loss(op):
            return lambda x, w, b: jnp.sum(op(x, w, b) * t)

        assert float(jnp.max(jnp.abs(
            conv2d_transpose(x, w, b) - conv2d_transpose_pc(x, w, b)))) == 0.0
        g_ref = jax.grad(loss(conv2d_transpose), argnums=(0, 1, 2))(x, w, b)
        g_pc = jax.grad(loss(conv2d_transpose_pc), argnums=(0, 1, 2))(x, w, b)
        for gr, gp, name in zip(g_ref, g_pc, "xwb"):
            assert float(jnp.max(jnp.abs(gr - gp))) == 0.0, (name, h, cout)


def test_convT_pc_bf16_policy_grads_close():
    """Under the `default` numeric policy conv2d_transpose_pc's dW runs the
    phase-conv formulation with bf16 contraction operands (same pass count
    as XLA's DEFAULT-precision grad conv); grads must stay within bf16
    tolerance of the f32 autodiff reference."""
    import numpy as np
    from disvae_tpu.ops.convs import conv2d_transpose, conv2d_transpose_pc
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    t = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))

    def loss(op):
        return lambda x, w, b: jnp.sum(op(x, w, b) * t)

    g_ref = jax.grad(loss(conv2d_transpose), argnums=(0, 1, 2))(x, w, b)
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", None)
    try:
        g_pc = jax.grad(loss(conv2d_transpose_pc), argnums=(0, 1, 2))(
            x, w, b)
    finally:
        jax.config.update("jax_default_matmul_precision", old)
    for gr, gp, name in zip(g_ref, g_pc, "xwb"):
        scale = float(jnp.max(jnp.abs(gr))) + 1e-30
        err = float(jnp.max(jnp.abs(gr - gp))) / scale
        assert err < 3e-2, (name, err)


def test_convT_pallas_bwd_exact_f32():
    """The fused Pallas backward (ops/pallas_convt_bwd.py) run on the CPU
    interpreter with f32 contraction equals autodiff's (dx, dw, db) to f32
    tolerance on every decoder-final shape, including odd Cout, tiny
    spatial dims, and batch sizes exercising the block-size fallbacks
    (6 -> bn=2, 3 -> bn=1)."""
    import numpy as np
    from disvae_tpu.ops.convs import conv2d_transpose
    from disvae_tpu.ops.pallas_convt_bwd import convt3_bwd_pl
    rng = np.random.RandomState(6)
    for n, h, cin, cout in [(4, 16, 32, 3), (4, 16, 32, 1), (6, 4, 8, 5),
                            (3, 2, 2, 2)]:
        x = jnp.asarray(rng.randn(n, h, h, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(4, 4, cin, cout).astype(np.float32))
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        t = jnp.asarray(rng.randn(n, 2 * h, 2 * h, cout).astype(np.float32))
        g = jax.grad(lambda x, w, b: jnp.sum(conv2d_transpose(x, w, b) * t),
                     argnums=(0, 1, 2))(x, w, b)
        out = convt3_bwd_pl(x, w, t, interpret=True, cdt=jnp.float32)
        for ref, got, name in zip(g, out, ("dx", "dw", "db")):
            scale = float(jnp.max(jnp.abs(ref))) + 1e-30
            err = float(jnp.max(jnp.abs(ref - got))) / scale
            assert err < 1e-5, (n, h, cin, cout, name, err)


def test_convT_pallas_parity_policy_grads_identical():
    """Under parity policies (tests run at `highest`) conv2d_transpose_pl's
    backward emits the EXACT primitives jax's autodiff emits — all three
    grads must match the autodiff reference bitwise."""
    import numpy as np
    from disvae_tpu.ops.convs import conv2d_transpose
    from disvae_tpu.ops.pallas_convt_bwd import conv2d_transpose_pl
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    t = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))

    def loss(op):
        return lambda x, w, b: jnp.sum(op(x, w, b) * t)

    assert float(jnp.max(jnp.abs(
        conv2d_transpose(x, w, b) - conv2d_transpose_pl(x, w, b)))) == 0.0
    g_ref = jax.grad(loss(conv2d_transpose), argnums=(0, 1, 2))(x, w, b)
    g_pl = jax.grad(loss(conv2d_transpose_pl), argnums=(0, 1, 2))(x, w, b)
    for gr, gp, name in zip(g_ref, g_pl, "xwb"):
        assert float(jnp.max(jnp.abs(gr - gp))) == 0.0, name


def test_convT_pallas_bf16_policy_grads_close():
    """Under the `default` numeric policy conv2d_transpose_pl's backward
    runs the fused Pallas kernels with bf16 contraction operands (CPU:
    interpreter mode via the module flag); grads must stay within bf16
    tolerance of the f32 autodiff reference."""
    import numpy as np
    from disvae_tpu.ops import pallas_convt_bwd as pcb
    from disvae_tpu.ops.convs import conv2d_transpose
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    t = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))

    def loss(op):
        return lambda x, w, b: jnp.sum(op(x, w, b) * t)

    g_ref = jax.grad(loss(conv2d_transpose), argnums=(0, 1, 2))(x, w, b)
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", None)
    pcb._INTERPRET = True
    try:
        g_pl = jax.grad(loss(pcb.conv2d_transpose_pl),
                        argnums=(0, 1, 2))(x, w, b)
    finally:
        pcb._INTERPRET = None  # back to backend auto-detection
        jax.config.update("jax_default_matmul_precision", old)
    for gr, gp, name in zip(g_ref, g_pl, "xwb"):
        scale = float(jnp.max(jnp.abs(gr))) + 1e-30
        err = float(jnp.max(jnp.abs(gr - gp))) / scale
        assert err < 3e-2, (name, err)


def test_convT_mxu_bf16_policy_grads_close():
    """Under the `default` numeric policy the custom backward casts its
    contraction operands to bf16 up front (one bf16 pass — the same pass
    XLA's DEFAULT-precision gradient conv makes); grads must stay within
    bf16 tolerance of the f32 reference."""
    import numpy as np
    from disvae_tpu.ops.convs import conv2d_transpose, conv2d_transpose_mxu
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    t = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))

    def loss(op):
        return lambda x, w, b: jnp.sum(op(x, w, b) * t)

    g_ref = jax.grad(loss(conv2d_transpose), argnums=(0, 1, 2))(x, w, b)
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", None)
    try:
        g_mxu = jax.grad(loss(conv2d_transpose_mxu), argnums=(0, 1, 2))(
            x, w, b)
    finally:
        jax.config.update("jax_default_matmul_precision", old)
    for gr, gm, name in zip(g_ref, g_mxu, "xwb"):
        scale = float(jnp.max(jnp.abs(gr))) + 1e-30
        err = float(jnp.max(jnp.abs(gr - gm))) / scale
        assert err < 3e-2, (name, err)
