"""Full joint-training-step parity: loss AND gradients vs an independent
torch implementation of the reference dataflow (reference `Model.py:60-134`,
`Main.py:291-377`) with identical weights and inputs.

Randomness is pinned by setting ``noise_degree = 0`` (kills the CL noise —
the only stochastic piece of the joint loss).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from diffmm_tpu.data.loader import to_device
from diffmm_tpu.models.gcn import init_gcn_params
from diffmm_tpu.ops.graph import bi_adj_to_dense, build_bi_adj_host
from diffmm_tpu.train.steps import make_train_steps
from diffmm_tpu.diffusion.schedule import make_schedule

pytestmark = pytest.mark.slow  # every test here (or its shared fixture) takes >10s on a stock CPU box


def _torch_joint_loss(params_np, adj_np, modal_adj_np, feats_np, users, pos, neg, hyper, reg, cl_method):
    """Independent torch recomputation of the joint loss (noise_degree=0)."""
    U, d = params_np["u_embs"].shape
    u_embs = torch.tensor(params_np["u_embs"], requires_grad=True)
    i_embs = torch.tensor(params_np["i_embs"], requires_grad=True)
    projs = [
        (torch.tensor(p["w"], requires_grad=True), torch.tensor(p["b"], requires_grad=True))
        for p in params_np["modal_proj"]
    ]
    modal_weight = torch.tensor(params_np["modal_weight"], requires_grad=True)
    adj = torch.tensor(adj_np)
    modal_adjs = [torch.tensor(a) for a in modal_adj_np]
    feats = [torch.tensor(f) for f in feats_np]

    joint = torch.cat([u_embs, i_embs], dim=0)
    weight = torch.softmax(modal_weight, dim=0)

    modal_u, modal_i = [], []
    for (w, b), f, a in zip(projs, feats, modal_adjs):
        pf = F.normalize(f @ w + b, p=2, dim=1)
        out = a @ torch.cat([u_embs, pf], dim=0)
        modal_u.append(out[:U])
        modal_i.append(out[U:])
    id_out = adj @ joint
    id_u, id_i = id_out[:U], id_out[U:]

    aware_u = [id_u + hyper["modal_adj_weight"] * mu for mu in modal_u]
    aware_i = [id_i + hyper["modal_adj_weight"] * mi for mi in modal_i]
    fused_u = sum(w * au for w, au in zip(weight, aware_u))
    fused_i = sum(w * ai for w, ai in zip(weight, aware_i))
    # Reference `Model.py:129-131`: ``final_embs = modal_embs`` ALIASES, then
    # two in-place ``+=`` — the second reads the already-updated tensor, so
    # final = (1 + residual_weight) * (fused + adj @ fused). Derived from the
    # reference lines (executed with aliasing), not from the repo's formula.
    fused = torch.cat([fused_u, fused_i], dim=0)
    final = fused.clone()
    final += adj @ fused.clone()          # fused is the pre-update value here
    final += hyper["residual_weight"] * final.clone()  # reads updated value
    final_u, final_i = final[:U], final[U:]

    ue, pe, ne = final_u[users], final_i[pos], final_i[neg]
    rec = -torch.log(
        1e-5 + torch.sigmoid((ue * pe).sum(1) - (ue * ne).sum(1))
    ).mean()
    reg_loss = reg * (u_embs.pow(2).sum() + i_embs.pow(2).sum())

    def infonce(v1, v2, idx, temp):
        a = F.normalize(v1[idx], p=2, dim=1)
        b = F.normalize(v2[idx], p=2, dim=1)
        return -torch.diag(F.log_softmax(a @ b.T / temp, dim=1)).mean()

    # cross-layer CL, noise_degree = 0
    e = joint
    layers = []
    for _ in range(3):
        e = adj @ e
        layers.append(e)
    mean_e = torch.stack(layers).mean(0)
    l0 = layers[0]
    cl = (
        infonce(mean_e[:U], l0[:U], users, hyper["cross_cl_temp"])
        + infonce(mean_e[U:], l0[U:], pos, hyper["cross_cl_temp"])
    ) * hyper["cross_cl_rate"]

    if cl_method == 1:
        for a_ in range(len(modal_u)):
            for b_ in range(a_ + 1, len(modal_u)):
                cl = cl + (
                    infonce(modal_u[a_], modal_u[b_], users, hyper["modal_cl_temp"])
                    + infonce(modal_i[a_], modal_i[b_], pos, hyper["modal_cl_temp"])
                ) * hyper["modal_cl_rate"]
    else:
        for m in range(len(modal_u)):
            cl = cl + (
                infonce(final_u, modal_u[m], users, hyper["modal_cl_temp"])
                + infonce(final_i, modal_i[m], pos, hyper["modal_cl_temp"])
            ) * hyper["modal_cl_rate"]

    total = rec + reg_loss + cl
    total.backward()
    grads = {
        "u_embs": u_embs.grad.numpy(),
        "i_embs": i_embs.grad.numpy(),
        "modal_weight": modal_weight.grad.numpy(),
        "proj_w0": projs[0][0].grad.numpy(),
    }
    return float(total), grads


@pytest.mark.parametrize("cl_method", [0, 1])
def test_joint_loss_and_grads_match_torch(tiny_config, tiny_data, cl_method):
    cfg = copy.deepcopy(tiny_config)
    cfg.base.cl_method = cl_method
    cfg.hyper.noise_degree = 0.0  # pin the only randomness in the joint loss
    host = tiny_data
    data = to_device(host)

    params = init_gcn_params(
        jax.random.PRNGKey(3), host.user_num, host.item_num, cfg.base.latdim,
        host.feat_dims,
    )
    schedule = make_schedule(0.1, 1e-4, 0.02, 5)
    steps = make_train_steps(cfg, schedule, len(host.modalities), host.k_max)

    rng = np.random.default_rng(1)
    users = jnp.asarray(rng.integers(0, host.user_num, 16).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, host.item_num, 16).astype(np.int32))
    neg = jnp.asarray(rng.integers(0, host.item_num, 16).astype(np.int32))

    # jax loss + grads via the real step machinery (modal adjs = main adj)
    adj = data.adj
    modal_adjs = tuple(adj for _ in host.modalities)

    from diffmm_tpu.models.gcn import gcn_mm
    from diffmm_tpu.ops.losses import bpr_loss, l2_reg_loss

    def loss_fn(p):
        out = gcn_mm(
            p, adj, list(modal_adjs), data.raw_feats,
            modal_adj_weight=cfg.hyper.modal_adj_weight,
            residual_weight=cfg.hyper.residual_weight,
        )
        u_e = out.u_final.take(users, axis=0)
        p_e = out.i_final.take(pos, axis=0)
        n_e = out.i_final.take(neg, axis=0)
        rec = bpr_loss(u_e, p_e, n_e)
        reg = l2_reg_loss(cfg.train.reg, [p["u_embs"], p["i_embs"]])
        # reuse the internal CL helpers through joint_step? — recompute here
        # with the same helpers the step uses
        import diffmm_tpu.train.steps as steps_mod  # noqa

        return rec + reg, out

    # run through the actual jitted joint step to extract loss pieces
    hp = {
        "sim_weight": jnp.float32(cfg.hyper.sim_weight),
        "reg": jnp.float32(cfg.train.reg),
        "noise_degree": jnp.float32(cfg.hyper.noise_degree),
        "cross_cl_temp": jnp.float32(cfg.hyper.cross_cl_temp),
        "cross_cl_rate": jnp.float32(cfg.hyper.cross_cl_rate),
        "modal_cl_temp": jnp.float32(cfg.hyper.modal_cl_temp),
        "modal_cl_rate": jnp.float32(cfg.hyper.modal_cl_rate),
        "modal_adj_weight": jnp.float32(cfg.hyper.modal_adj_weight),
        "residual_weight": jnp.float32(cfg.hyper.residual_weight),
    }
    tx_params, _, metrics = steps.joint_step(
        params,
        __import__("optax").scale_by_adam().init(params),
        adj,
        modal_adjs,
        data.raw_feats,
        users,
        pos,
        neg,
        jax.random.PRNGKey(0),
        jnp.float32(0.0),  # lr=0 -> params unchanged; we read the loss only
        hp,
    )
    total_jax = float(metrics[0])

    # grads via value_and_grad over the same composition the step uses
    def full_loss(p):
        out = gcn_mm(
            p, adj, list(modal_adjs), data.raw_feats,
            modal_adj_weight=cfg.hyper.modal_adj_weight,
            residual_weight=cfg.hyper.residual_weight,
        )
        u_e = out.u_final.take(users, axis=0)
        p_e = out.i_final.take(pos, axis=0)
        n_e = out.i_final.take(neg, axis=0)
        from diffmm_tpu.ops.losses import info_nce, l2_normalize

        rec = bpr_loss(u_e, p_e, n_e)
        reg = l2_reg_loss(cfg.train.reg, [p["u_embs"], p["i_embs"]])
        # cross-layer CL with noise_degree=0 (deterministic)
        ju, ji = out.id_u, out.id_i
        acc_u, acc_i = jnp.zeros_like(ju), jnp.zeros_like(ji)
        l0u, l0i = ju, ji
        from diffmm_tpu.ops.graph import spmm_bi

        for k in range(3):
            if k > 0:
                ju, ji = spmm_bi(adj, ju, ji)
            acc_u, acc_i = acc_u + ju, acc_i + ji
            if k == 0:
                l0u, l0i = ju, ji
        cl = (
            info_nce(acc_u / 3.0, l0u, users, cfg.hyper.cross_cl_temp)
            + info_nce(acc_i / 3.0, l0i, pos, cfg.hyper.cross_cl_temp)
        ) * cfg.hyper.cross_cl_rate
        if cl_method == 1:
            M = len(host.modalities)
            for a_ in range(M):
                for b_ in range(a_ + 1, M):
                    cl += (
                        info_nce(out.modal_u[a_], out.modal_u[b_], users, cfg.hyper.modal_cl_temp)
                        + info_nce(out.modal_i[a_], out.modal_i[b_], pos, cfg.hyper.modal_cl_temp)
                    ) * cfg.hyper.modal_cl_rate
        else:
            for m in range(len(host.modalities)):
                cl += (
                    info_nce(out.u_final, out.modal_u[m], users, cfg.hyper.modal_cl_temp)
                    + info_nce(out.i_final, out.modal_i[m], pos, cfg.hyper.modal_cl_temp)
                ) * cfg.hyper.modal_cl_rate
        return rec + reg + cl

    total_manual, grads = jax.value_and_grad(full_loss)(params)
    assert total_jax == pytest.approx(float(total_manual), rel=1e-5)

    # torch recomputation
    adj_dense = np.asarray(bi_adj_to_dense(
        build_bi_adj_host(host.train_rows, host.train_cols, host.user_num, host.item_num)
    ))
    params_np = jax.tree.map(np.asarray, params)
    hyper = {
        "modal_adj_weight": cfg.hyper.modal_adj_weight,
        "residual_weight": cfg.hyper.residual_weight,
        "cross_cl_temp": cfg.hyper.cross_cl_temp,
        "cross_cl_rate": cfg.hyper.cross_cl_rate,
        "modal_cl_temp": cfg.hyper.modal_cl_temp,
        "modal_cl_rate": cfg.hyper.modal_cl_rate,
    }
    total_torch, grads_torch = _torch_joint_loss(
        params_np, adj_dense, [adj_dense] * len(host.modalities),
        [np.asarray(f) for f in host.raw_feats],
        np.asarray(users), np.asarray(pos), np.asarray(neg),
        hyper, cfg.train.reg, cl_method,
    )

    assert float(total_manual) == pytest.approx(total_torch, rel=2e-4)
    np.testing.assert_allclose(
        np.asarray(grads["u_embs"]), grads_torch["u_embs"], rtol=2e-3, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(grads["i_embs"]), grads_torch["i_embs"], rtol=2e-3, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(grads["modal_weight"]), grads_torch["modal_weight"], rtol=2e-3, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(grads["modal_proj"][0]["w"]), grads_torch["proj_w0"], rtol=2e-3, atol=2e-5
    )
