"""Sharding layout: how every array of the workload is placed on the mesh.

The recipe is the standard single-controller JAX one: place inputs with
`jax.device_put(x, NamedSharding(mesh, spec))`, let `jit` propagate shardings
through the (unchanged) step functions, and let XLA insert the collectives —
gradient ``psum`` over the ``data`` axis, ``all_gather``/``reduce_scatter``
around the catalog-sharded matmuls — over ICI.

Layout (mesh axes ``(data, model)``, SURVEY.md §2.3):

  * **replicated** — all model parameters, optimizer state, normalization
    vectors, projected/raw modality features, the diffusion schedule. These
    are O(N·latdim) and tiny next to the catalog-dim buffers.
  * **data axis** — every per-batch leading dimension: interaction triples
    (users/pos/neg), diffusion user-row blocks, eval user blocks; and the
    train edge list (nnz-length arrays), so each device reduces its edge
    shard in SpMM and XLA cross-reduces the full-size outputs.
  * **model axis** — the catalog (item) dimension of the big buffers: the
    dense train matrix ``(U, I)`` (the largest array in the workload —
    yelp-scale is tens of millions of cells, reference `DataHandler.py:128`
    materializes it dense on one GPU), and with it every ``(B, I)``
    intermediate the diffusion phases produce.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffmm_tpu.data.loader import DeviceData, HostData
from diffmm_tpu.ops.graph import BiAdj
from diffmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """First dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def catalog_sharded(mesh: Mesh) -> NamedSharding:
    """(…, item) matrix with the item axis split over the model axis."""
    return NamedSharding(mesh, P(None, MODEL_AXIS))


def catalog_spec(last_dim: int, mesh: Mesh) -> NamedSharding:
    """The one placement policy for ``(..., catalog)`` matrices: shard the
    catalog dim over the model axis when it divides, else replicate (JAX
    rejects uneven ``device_put`` shardings). Shape-only so in-program
    constraint sites (the fused epoch scan's adjacency builds) share it."""
    if last_dim % mesh.shape[MODEL_AXIS] == 0:
        return catalog_sharded(mesh)
    return replicated(mesh)


def catalog_sharded_or_replicated(x: jax.Array, mesh: Mesh) -> NamedSharding:
    """:func:`catalog_spec` of an array's last dim."""
    return catalog_spec(x.shape[-1], mesh)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place an arbitrary pytree fully replicated on the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Split a per-batch array's leading dim over the data axis."""
    return jax.device_put(x, data_sharded(mesh))


def shard_blocks(x: jax.Array, mesh: Mesh) -> jax.Array:
    """(n_blocks, batch, ...) epoch input: batch dim over the data axis."""
    spec = [None] * x.ndim
    spec[1] = DATA_AXIS
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def _shard_adj(adj: BiAdj, mesh: Mesh) -> BiAdj:
    """Edge arrays over the data axis, normalization vectors replicated.

    ``iu_perm`` gathers from the edge shards (one all_gather of int32
    edge ids per SpMM direction — cheap next to the embedding traffic).
    """
    edge = data_sharded(mesh)
    rep = replicated(mesh)
    return BiAdj(
        ui_rows=jax.device_put(adj.ui_rows, edge),
        ui_cols=jax.device_put(adj.ui_cols, edge),
        iu_perm=jax.device_put(adj.iu_perm, edge),
        s_user=jax.device_put(adj.s_user, rep),
        s_item=jax.device_put(adj.s_item, rep),
        iu_inv=None if adj.iu_inv is None else jax.device_put(adj.iu_inv, edge),
    )


def _place_train_store(store, mesh: Mesh):
    """Dense store: catalog columns over the model axis (it is the largest
    array of the dense regime). CSR store: replicated — its arrays are
    O(nnz)/O(U) (400 MB at 100M edges vs the 20+ GB dense matrix they
    replace), and every consumer gathers them at data-dependent positions
    (span reads, binary-search probes), which sharded operands would turn
    into per-access collectives."""
    from diffmm_tpu.data.membership import TrainCSR

    if isinstance(store, TrainCSR):
        rep = replicated(mesh)
        # tree_map keeps the static plan (k_max, k_cut) and replicates every
        # array leaf, including the head/tail fixup arrays
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, rep), store
        )
    return jax.device_put(store, catalog_sharded_or_replicated(store, mesh))


def shard_device_data(data: DeviceData, mesh: Mesh) -> DeviceData:
    """Place a :class:`DeviceData` according to the layout above."""
    rep = replicated(mesh)
    edge = data_sharded(mesh)
    return DeviceData(
        adj=None if data.adj is None else _shard_adj(data.adj, mesh),
        train_rows=jax.device_put(data.train_rows, edge),
        train_cols=jax.device_put(data.train_cols, edge),
        user_degrees=jax.device_put(data.user_degrees, rep),
        csr_offsets=jax.device_put(data.csr_offsets, rep),
        train_store=_place_train_store(data.train_store, mesh),
        raw_feats=[jax.device_put(f, rep) for f in data.raw_feats],
        test_users=jax.device_put(data.test_users, rep),
        test_items=jax.device_put(data.test_items, rep),
        test_counts=jax.device_put(data.test_counts, rep),
        val_users=None if data.val_users is None else jax.device_put(data.val_users, rep),
        val_items=None if data.val_items is None else jax.device_put(data.val_items, rep),
        val_counts=None if data.val_counts is None else jax.device_put(data.val_counts, rep),
    )


def _model_axis(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]


def gcn_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for the GCN params (same structure).

    ``i_embs`` (item_num, latdim) is the catalog-dim parameter (SURVEY.md
    §2.3; reference `Model.py:22` keeps it on one GPU) — its rows ride the
    model axis so parameter + optimizer-moment memory scales with the axis.
    Everything else is O(N·latdim) or smaller and stays replicated. Leaves
    whose catalog dim does not divide the axis stay replicated (uneven
    `device_put` shardings are rejected by JAX).
    """
    rep = replicated(mesh)
    sh = jax.tree.map(lambda _: rep, params)
    m = _model_axis(mesh)
    if params["i_embs"].shape[0] % m == 0:
        sh["i_embs"] = NamedSharding(mesh, P(MODEL_AXIS, None))
    return sh


def denoise_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for one denoiser's params (same structure).

    The wide layers are the SURVEY §2.3 model-parallel targets (reference
    `Model.py:156-162`): the first in-layer's weight has item_num+d_emb input
    rows and the last out-layer maps hidden -> item_num. Sharding them puts
    the O(item_num·hidden) parameters — by far the largest in the model —
    on the model axis; XLA turns the forward matmuls into a contracting-dim
    psum (in-layer) and an output-sharded matmul (out-layer).
    """
    rep = replicated(mesh)
    sh = jax.tree.map(lambda _: rep, params)
    m = _model_axis(mesh)
    w_in = params["in_layers"][0]["w"]
    if w_in.shape[0] % m == 0:
        sh["in_layers"][0]["w"] = NamedSharding(mesh, P(MODEL_AXIS, None))
    w_out = params["out_layers"][-1]["w"]
    if w_out.shape[1] % m == 0:
        sh["out_layers"][-1]["w"] = NamedSharding(mesh, P(None, MODEL_AXIS))
        sh["out_layers"][-1]["b"] = NamedSharding(mesh, P(MODEL_AXIS))
    return sh


def place_adam_state(state: Any, param_shardings: Any, mesh: Mesh) -> Any:
    """Place a ``ScaleByAdamState`` so mu/nu mirror the param placement.

    (``jit(tx.init)`` can't do this: the zero moments have no data dependence
    on the params, so XLA is free to leave them on the default device.)
    """
    import optax

    rep = replicated(mesh)
    assert isinstance(state, optax.ScaleByAdamState), type(state)
    return optax.ScaleByAdamState(
        count=jax.device_put(state.count, rep),
        mu=jax.device_put(state.mu, param_shardings),
        nu=jax.device_put(state.nu, param_shardings),
    )


def shard_model_params(gcn_params: Any, dn_params: list, mesh: Mesh):
    """Place params per the catalog layout above; returns the placed params
    plus their sharding trees (for :func:`place_adam_state` / checkpoint
    restore templates)."""
    gcn_sh = gcn_param_shardings(gcn_params, mesh)
    dn_sh = [denoise_param_shardings(p, mesh) for p in dn_params]
    gcn_params = jax.device_put(gcn_params, gcn_sh)
    dn_params = [jax.device_put(p, s) for p, s in zip(dn_params, dn_sh)]
    return gcn_params, dn_params, gcn_sh, dn_sh


def check_batch_divisibility(batch: int, mesh: Mesh) -> None:
    n_data = mesh.shape[DATA_AXIS]
    if batch % n_data:
        raise ValueError(
            f"train.batch={batch} must be divisible by the data-axis size "
            f"{n_data} for even sharding"
        )
