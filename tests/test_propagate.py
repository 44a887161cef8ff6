"""Custom-VJP sorted edge propagation: spmm_bi with plans == without, for
values AND gradients (CPU: plans exercise the XLA reduce branch of the
propagator — the kernel itself is covered by test_segsum.py; on TPU the same
code paths run the Pallas kernel)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffmm_tpu.data.loader import pad_edges
from diffmm_tpu.ops.graph import build_bi_adj_host, spmm_bi


def _plans(tiny_data):
    """Hand-made single-piece plans over the padded layouts (the XLA-reduce
    branch of sorted_segment_sum_planned is used on CPU via plan=None in
    _reduce_sorted... so build real plans to exercise the planned path)."""
    rows_p, cols_p = pad_edges(
        tiny_data.train_rows, tiny_data.train_cols,
        tiny_data.user_num, tiny_data.item_num,
    )
    nnz_real = tiny_data.nnz
    u_plan = ((0, nnz_real, 0, tiny_data.user_num),)
    i_plan = ((0, nnz_real, 0, tiny_data.item_num),)
    return u_plan, i_plan


def test_propagate_values_and_grads_match(tiny_data, rng):
    adj = _padded_adj(tiny_data)
    U, I = tiny_data.user_num, tiny_data.item_num
    xu = jnp.asarray(rng.standard_normal((U, 8)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((I, 8)).astype(np.float32))
    cu = jnp.asarray(rng.standard_normal((U, 8)).astype(np.float32))
    ci = jnp.asarray(rng.standard_normal((I, 8)).astype(np.float32))
    u_plan, i_plan = _plans(tiny_data)

    def loss(plans):
        def f(xu, xi):
            yu, yi = spmm_bi(adj, xu, xi, plans)
            return jnp.sum(yu * cu) + jnp.sum(yi * ci)

        return f

    base = loss((None, None))
    planned = loss((u_plan, i_plan))
    v0, g0 = jax.value_and_grad(base, argnums=(0, 1))(xu, xi)
    v1, g1 = jax.value_and_grad(planned, argnums=(0, 1))(xu, xi)
    # interpret-mode kernel on CPU keeps f32 exactness
    assert abs(float(v0) - float(v1)) < 1e-3 * (1 + abs(float(v0)))
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2)


def test_propagate_bf16_compute_close(tiny_data, rng):
    """compute="bf16" rounds only the per-edge messages (f32 accumulation):
    values and grads stay within bf16 rounding of the f32 path."""
    adj = _padded_adj(tiny_data)
    U, I = tiny_data.user_num, tiny_data.item_num
    xu = jnp.asarray(rng.standard_normal((U, 8)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((I, 8)).astype(np.float32))
    cu = jnp.asarray(rng.standard_normal((U, 8)).astype(np.float32))
    ci = jnp.asarray(rng.standard_normal((I, 8)).astype(np.float32))
    plans = _plans(tiny_data)

    def loss(compute):
        def f(xu, xi):
            yu, yi = spmm_bi(adj, xu, xi, plans, compute)
            return jnp.sum(yu * cu) + jnp.sum(yi * ci)

        return f

    v0, g0 = jax.value_and_grad(loss("f32"), argnums=(0, 1))(xu, xi)
    v1, g1 = jax.value_and_grad(loss("bf16"), argnums=(0, 1))(xu, xi)
    assert jnp.asarray(v1).dtype == jnp.float32
    assert abs(float(v0) - float(v1)) < 2e-2 * (1 + abs(float(v0)))
    for a, b in zip(g0, g1):
        assert jnp.asarray(b).dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=4e-2, atol=4e-2)


def test_propagate_ranked_item_plan(tiny_data, rng):
    """The rank-space plan on the item direction (the dynamic-layout slot)
    matches the scatter path for values and gradients."""
    from diffmm_tpu.ops.pallas.segsum import make_ranked_plan

    adj = _padded_adj(tiny_data)
    U, I = tiny_data.user_num, tiny_data.item_num
    nnz_pad = int(adj.ui_rows.shape[0])
    u_plan, _ = _plans(tiny_data)
    ranked = make_ranked_plan(nnz_pad, d=8, chunk=64)
    assert ranked is not None
    xu = jnp.asarray(rng.standard_normal((U, 8)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((I, 8)).astype(np.float32))
    cu = jnp.asarray(rng.standard_normal((U, 8)).astype(np.float32))
    ci = jnp.asarray(rng.standard_normal((I, 8)).astype(np.float32))

    def loss(plans):
        def f(xu, xi):
            yu, yi = spmm_bi(adj, xu, xi, plans)
            return jnp.sum(yu * cu) + jnp.sum(yi * ci)

        return f

    v0, g0 = jax.value_and_grad(loss((None, None)), argnums=(0, 1))(xu, xi)
    v1, g1 = jax.value_and_grad(loss((u_plan, ranked)), argnums=(0, 1))(xu, xi)
    assert abs(float(v0) - float(v1)) < 1e-3 * (1 + abs(float(v0)))
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2)


def _padded_adj(tiny_data):
    rows_p, cols_p = pad_edges(
        tiny_data.train_rows, tiny_data.train_cols,
        tiny_data.user_num, tiny_data.item_num,
    )
    return build_bi_adj_host(
        rows_p, cols_p, tiny_data.user_num, tiny_data.item_num
    )
