"""Dual-direction fused SpMM kernel vs the two-pass XLA path (interpret
mode on CPU): forward AND gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from diffmm_tpu.ops.pallas.spmm_dual import _dual_call, dual_fits_vmem, spmm_dual


def _ref(mat, z_u, z_i):
    m = mat.astype(jnp.bfloat16).astype(jnp.float32)
    zu = z_u.astype(jnp.bfloat16).astype(jnp.float32)
    zi = z_i.astype(jnp.bfloat16).astype(jnp.float32)
    return m @ zi, m.T @ zu


def test_forward_matches_two_pass(rng):
    U, I, d = 70, 50, 16
    mat = jnp.asarray((rng.random((U, I)) < 0.1).astype(np.float32))
    z_u = jnp.asarray(rng.standard_normal((U, d)).astype(np.float32))
    z_i = jnp.asarray(rng.standard_normal((I, d)).astype(np.float32))
    yu, yi = _dual_call(mat, z_u, z_i, tu=32, interpret=True)
    wu, wi = _ref(mat, z_u, z_i)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(wu), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(wi), rtol=1e-5, atol=1e-5)


def test_gradients_match(rng):
    U, I, d = 40, 30, 8
    mat = jnp.asarray((rng.random((U, I)) < 0.15).astype(np.float32))
    z_u = jnp.asarray(rng.standard_normal((U, d)).astype(np.float32))
    z_i = jnp.asarray(rng.standard_normal((I, d)).astype(np.float32))
    cu = jnp.asarray(rng.standard_normal((U, d)).astype(np.float32))
    ci = jnp.asarray(rng.standard_normal((I, d)).astype(np.float32))

    def loss_dual(zu, zi):
        yu, yi = spmm_dual(mat, zu, zi, 32, True)
        return jnp.sum(yu * cu) + jnp.sum(yi * ci)

    def loss_ref(zu, zi):
        yu, yi = _ref(mat, zu, zi)
        return jnp.sum(yu * cu) + jnp.sum(yi * ci)

    gd = jax.grad(loss_dual, argnums=(0, 1))(z_u, z_i)
    gr = jax.grad(loss_ref, argnums=(0, 1))(z_u, z_i)
    for a, b in zip(gd, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2)


def test_vmem_gate():
    assert dual_fits_vmem(9308, 6710, 64)  # tiktok fits
    assert not dual_fits_vmem(100000, 80000, 64)  # yelp-ish does not


def test_int8_mat_converts_in_kernel(rng):
    """int8-stored adjacencies enter the kernel as int8 (half-width HBM
    read) and convert per block in VMEM — results bit-match the bf16 path,
    and gradients flow (integer input takes a float0 tangent)."""
    U, I, d = 70, 50, 16
    mask = (rng.random((U, I)) < 0.1)
    mat8 = jnp.asarray(mask.astype(np.int8))
    mat16 = jnp.asarray(mask.astype(np.float32)).astype(jnp.bfloat16)
    z_u = jnp.asarray(rng.standard_normal((U, d)).astype(np.float32))
    z_i = jnp.asarray(rng.standard_normal((I, d)).astype(np.float32))
    yu8, yi8 = _dual_call(mat8, z_u, z_i, tu=32, interpret=True)
    yu16, yi16 = _dual_call(mat16, z_u, z_i, tu=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(yu8), np.asarray(yu16))
    np.testing.assert_array_equal(np.asarray(yi8), np.asarray(yi16))

    def loss(zu, zi):
        a, b = spmm_dual(mat8, zu, zi, 32, True)
        return jnp.sum(a) + jnp.sum(b)

    gu, gi = jax.grad(loss, argnums=(0, 1))(z_u, z_i)
    assert np.isfinite(np.asarray(gu)).all()
    assert np.isfinite(np.asarray(gi)).all()


def test_vmem_gate_counts_the_converted_copy():
    """int8 tiles convert to bf16 in VMEM, so the admitted tile must not be
    larger than the bf16 case would allow — int8 buys HBM traffic, not tile
    size (the converted copy costs what the bf16 tile would)."""
    from diffmm_tpu.ops.pallas.spmm_dual import pick_tu

    tu_bf16 = pick_tu(9308, 6710, 64, 2)
    tu_int8 = pick_tu(9308, 6710, 64, 1)
    assert tu_int8 is not None and tu_bf16 is not None
    assert tu_int8 <= 512 and tu_int8 >= tu_bf16  # never smaller, bounded
    # the int8 working set (2 storage tiles + 1 bf16 copy) must fit the
    # same 12 MiB budget the gate promises
    ip = ((6710 + 127) // 128) * 128
    dp = 128
    assert (2 * tu_int8 * ip * 1 + tu_int8 * ip * 2
            + ip * dp * 4 + ip * dp * 2 + 2 * tu_int8 * dp * 6) <= 12 << 20
