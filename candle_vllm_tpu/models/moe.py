"""Mixture-of-experts layer.

Re-designs the reference's fused-MoE zoo
(``/root/reference/src/openai/models/layers/moe.rs``: topk_softmax +
moe_gemm CUDA kernels) the TPU way: tokens are sorted by expert on device
and the expert FFNs run as grouped GEMMs via ``jax.lax.ragged_dot`` —
XLA's native MoE primitive, which tiles directly onto the MXU without
capacity padding or token dropping.

Routing variants (reference moe.rs:334-2576 + models/mod.rs MoEConfig):
softmax / sigmoid scoring, norm_topk_prob, routed_scaling_factor, shared
experts, DeepSeek-style grouped top-k (n_group/topk_group).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from candle_vllm_tpu.config import MoEConfig
from candle_vllm_tpu.models.layers import _act

Params = Dict[str, jnp.ndarray]


def route(
    x: jnp.ndarray,               # [T, hidden]
    router_w: jnp.ndarray,        # [hidden, E]
    moe: MoEConfig,
    router_bias: Optional[jnp.ndarray] = None,
    e_score_bias: Optional[jnp.ndarray] = None,  # DeepSeek noaux_tc
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (topk_weights [T, k] f32, topk_idx [T, k] i32)."""
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32))
    if router_bias is not None:
        logits = logits + router_bias.astype(jnp.float32)
    if moe.scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
    select_scores = scores
    if e_score_bias is not None:
        select_scores = scores + e_score_bias.astype(jnp.float32)

    if moe.topk_method in ("group_limited_greedy", "noaux_tc") and moe.n_group > 1:
        # DeepSeek grouped routing: keep top `topk_group` groups, mask rest
        T, E = select_scores.shape
        g = select_scores.reshape(T, moe.n_group, E // moe.n_group)
        # group score: sum of top-2 experts in the group (noaux_tc) or max
        top2 = jax.lax.top_k(g, min(2, g.shape[-1]))[0]
        group_scores = (
            top2.sum(-1) if moe.topk_method == "noaux_tc" else g.max(-1)
        )
        _, keep = jax.lax.top_k(group_scores, moe.topk_group)      # [T, kg]
        mask = jnp.zeros((T, moe.n_group), bool).at[
            jnp.arange(T)[:, None], keep
        ].set(True)
        select_scores = jnp.where(
            jnp.repeat(mask, E // moe.n_group, axis=1), select_scores, -jnp.inf
        )

    _, topk_idx = jax.lax.top_k(select_scores, moe.num_experts_per_tok)
    topk_w = jnp.take_along_axis(scores, topk_idx, axis=-1)
    if moe.norm_topk_prob:
        topk_w = topk_w / jnp.maximum(
            topk_w.sum(-1, keepdims=True), 1e-20
        )
    topk_w = topk_w * moe.routed_scaling_factor
    return topk_w, topk_idx.astype(jnp.int32)


def moe_ffn(
    x: jnp.ndarray,            # [T, hidden]
    params: Params,
    prefix: str,               # e.g. "model.layers.3.mlp"
    moe: MoEConfig,
    hidden_act: str = "silu",
    mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """Sparse expert FFN over stacked expert banks:

      {prefix}.gate.weight            [hidden, E]       router
      {prefix}.gate.e_score_correction_bias   [E]       optional
      {prefix}.experts.gate_proj      [E, hidden, I]
      {prefix}.experts.up_proj        [E, hidden, I]
      {prefix}.experts.down_proj      [E, I, hidden]
      {prefix}.shared_expert.*        dense MLP         optional
      {prefix}.shared_expert_gate.weight [hidden, 1]    optional (qwen)
    """
    T, hidden = x.shape
    E = moe.num_experts
    k = moe.num_experts_per_tok
    act = _act(hidden_act)

    topk_w, topk_idx = route(
        x,
        params[f"{prefix}.gate.weight"],
        moe,
        e_score_bias=params.get(f"{prefix}.gate.e_score_correction_bias"),
    )

    # sort token-expert pairs by expert id -> grouped GEMM layout
    flat_idx = topk_idx.reshape(T * k)
    order = jnp.argsort(flat_idx)                       # [T*k]
    tok_of = order // k
    xs = x[tok_of]                                      # [T*k, hidden]
    w_sorted = topk_w.reshape(T * k)[order].astype(jnp.float32)
    if moe.apply_router_weight_on_input:
        # llama4: scale the expert INPUT by the routing weight
        # (llama4/mod.rs apply_router_weight_on_input; output weight = 1)
        xs = (xs.astype(jnp.float32) * w_sorted[:, None]).astype(x.dtype)
        w_sorted = jnp.ones_like(w_sorted)
    group_sizes = jnp.bincount(flat_idx, length=E).astype(jnp.int32)

    gu_qw = params.get(f"{prefix}.experts.gate_up_proj.qweight")
    g_qw = params.get(f"{prefix}.experts.gate_proj.qweight")
    g_off = params.get(f"{prefix}.experts.gate_proj.qweight_offload")
    tp = mesh.shape.get("tp", 1) if mesh is not None else 1
    if g_off is not None:
        # expert CPU offload (reference: num_experts_offload_per_rank,
        # models/mod.rs:445 + linear.rs:110-116): the tail experts' W4
        # banks live in pinned host memory; only the ROUTED offloaded
        # experts' tiles DMA to HBM inside this jitted step.  Under TP
        # each device hosts (and fetches) only its 1/tp shard of every
        # bank — the analogue of the reference's per-RANK offload.
        if tp > 1:
            # same all-or-none divisibility gate as the resident path /
            # offload_expert_banks host placement
            gso = params[f"{prefix}.experts.gate_proj.scales_offload"]
            dqo = params[f"{prefix}.experts.down_proj.qweight_offload"]
            dso = params[f"{prefix}.experts.down_proj.scales_offload"]
            if (
                g_off.shape[1] % tp or gso.shape[2] % tp
                or dqo.shape[2] % tp or dso.shape[1] % tp
            ):
                tp = 1
        y = _moe_quant_offload(
            xs, params, prefix, group_sizes, act, x.dtype,
            mesh=mesh, tp=tp,
        )
        out = jnp.zeros((T, hidden), jnp.float32).at[tok_of].add(
            y.astype(jnp.float32) * w_sorted[:, None]
        )
        return _add_shared_expert(
            out.astype(x.dtype), x, params, prefix, hidden_act
        )
    if g_qw is not None and tp > 1:
        # mirror ShardingPlan.apply's divisibility gate: the plan dropped
        # these banks to replicated if any dim didn't divide tp, in which
        # case the single-shard path below is the consistent one
        ds = params[f"{prefix}.experts.down_proj.scales"]
        dq = params[f"{prefix}.experts.down_proj.qweight"]
        gs_ = params[f"{prefix}.experts.gate_proj.scales"]
        if (
            g_qw.shape[1] % tp or gs_.shape[2] % tp
            or dq.shape[2] % tp or ds.shape[1] % tp
        ):
            tp = 1
    if g_qw is not None and tp > 1:
        # TP-sharded W4 expert banks (reference: expert sharding,
        # distributed.rs:108-203 + MergedParallelColumnLinear 252-535):
        # gate/up quantize SEPARATELY under TP (a fused [gate|up] OUT dim
        # cannot column-shard scale-aligned), the whole expert FFN runs in
        # ONE shard_map — column-parallel gate/up, local activation,
        # row-parallel down, psum — so each device streams 1/tp of every
        # routed expert's W4 tiles and no bank is ever replicated.
        from candle_vllm_tpu.ops.quant import grouped_quant_matmul

        def local_moe(xs_, gq, gs, uq, us, dq, ds, sizes):
            g = grouped_quant_matmul(xs_, gq, gs, sizes)
            u = grouped_quant_matmul(xs_, uq, us, sizes)
            h_ = (act(g) * u).astype(xs_.dtype)
            y_ = grouped_quant_matmul(h_, dq, ds, sizes)
            return jax.lax.psum(y_, "tp")

        rep2 = P(None, None)
        y = jax.shard_map(
            local_moe,
            mesh=mesh,
            in_specs=(
                rep2,
                P(None, "tp", None, None), P(None, None, "tp"),
                P(None, "tp", None, None), P(None, None, "tp"),
                P(None, None, "tp", None), P(None, "tp", None),
                P(None),
            ),
            out_specs=rep2,
            check_vma=False,
        )(
            xs,
            g_qw, params[f"{prefix}.experts.gate_proj.scales"],
            params[f"{prefix}.experts.up_proj.qweight"],
            params[f"{prefix}.experts.up_proj.scales"],
            params[f"{prefix}.experts.down_proj.qweight"],
            params[f"{prefix}.experts.down_proj.scales"],
            group_sizes,
        )
    elif g_qw is not None:
        # separate W4 banks, single shard
        from candle_vllm_tpu.ops.quant import grouped_quant_matmul

        g = grouped_quant_matmul(
            xs, g_qw, params[f"{prefix}.experts.gate_proj.scales"],
            group_sizes,
        )
        u = grouped_quant_matmul(
            xs, params[f"{prefix}.experts.up_proj.qweight"],
            params[f"{prefix}.experts.up_proj.scales"], group_sizes,
        )
        h = (act(g) * u).astype(x.dtype)
        y = grouped_quant_matmul(
            h,
            params[f"{prefix}.experts.down_proj.qweight"],
            params[f"{prefix}.experts.down_proj.scales"],
            group_sizes,
        )
    elif gu_qw is not None:
        # fused W4 expert bank (reference FusedMoeISQ/moe_gemm_gguf class):
        # decode streams ONLY the routed experts' packed tiles
        assert tp == 1, (
            "fused quantized gate_up expert banks cannot column-shard "
            "scale-aligned under TP; quantize with moe_fuse_gate_up=False "
            "(the engine does this automatically when a mesh is present)"
        )
        from candle_vllm_tpu.ops.quant import grouped_quant_matmul

        gu = grouped_quant_matmul(
            xs, gu_qw, params[f"{prefix}.experts.gate_up_proj.scales"],
            group_sizes,
        )
        inter = gu.shape[-1] // 2
        h = act(gu[:, :inter]) * gu[:, inter:]
        y = grouped_quant_matmul(
            h.astype(x.dtype),
            params[f"{prefix}.experts.down_proj.qweight"],
            params[f"{prefix}.experts.down_proj.scales"],
            group_sizes,
        )
    else:
        wgu = params.get(f"{prefix}.experts.gate_up_proj")
        if wgu is not None:
            # llama4-style fused bank [E, hidden, 2I]: one grouped GEMM,
            # then split halves (reference stores gate_up fused)
            gu = jax.lax.ragged_dot(xs, wgu, group_sizes)
            inter = gu.shape[-1] // 2
            h = act(gu[:, :inter]) * gu[:, inter:]
        else:
            wg = params[f"{prefix}.experts.gate_proj"]
            wu = params[f"{prefix}.experts.up_proj"]
            h = act(jax.lax.ragged_dot(xs, wg, group_sizes)) * \
                jax.lax.ragged_dot(xs, wu, group_sizes)
        wd = params[f"{prefix}.experts.down_proj"]
        y = jax.lax.ragged_dot(h.astype(x.dtype), wd, group_sizes)

    out = jnp.zeros((T, hidden), jnp.float32).at[tok_of].add(
        y.astype(jnp.float32) * w_sorted[:, None]
    )
    out = out.astype(x.dtype)

    return _add_shared_expert(out, x, params, prefix, hidden_act)


def _add_shared_expert(
    out: jnp.ndarray, x: jnp.ndarray, params: Params, prefix: str,
    hidden_act: str,
) -> jnp.ndarray:
    if f"{prefix}.shared_expert.gate_proj.weight" in params or \
       f"{prefix}.shared_experts.gate_proj.weight" in params:
        sp = (
            f"{prefix}.shared_expert"
            if f"{prefix}.shared_expert.gate_proj.weight" in params
            else f"{prefix}.shared_experts"
        )
        from candle_vllm_tpu.models.layers import mlp

        shared = mlp(x, params, sp, hidden_act)
        gate_w = params.get(f"{prefix}.shared_expert_gate.weight")
        if gate_w is not None:  # qwen2-moe style sigmoid gate
            shared = shared * jax.nn.sigmoid(
                jnp.dot(x, gate_w).astype(shared.dtype)
            )
        out = out + shared
    return out


def _moe_quant_offload(
    xs: jnp.ndarray,            # [R, hidden] rows sorted by expert
    params: Params,
    prefix: str,
    group_sizes: jnp.ndarray,   # [E] i32
    act,
    dtype,
    mesh: Optional[Mesh] = None,
    tp: int = 1,
) -> jnp.ndarray:
    """Expert FFN with the tail experts' W4 banks in pinned host memory.

    Resident experts [0, E_res) run the normal grouped W4 GEMM; each
    ROUTED offloaded expert's packed tiles are host->HBM DMA'd inside the
    step (dynamic_slice on the host bank + device_put — XLA lowers the
    pair to a DMA of exactly that expert's bytes; reference semantics:
    on-demand reload, linear.rs:110-116).  NSO slots bound the unrolled
    transfer count: at most min(n_offload, R) distinct offloaded experts
    can be routed in a step.

    Under TP (``tp > 1``) the host banks are tp-sharded (see
    offload_expert_banks), each device DMAs only ITS shard of the routed
    experts' tiles, and the whole FFN (resident grouped GEMM + offloaded
    dots) runs in one shard_map with a single trailing psum — the
    analogue of the reference's per-rank ``num_experts_offload_per_rank``
    (models/mod.rs:445)."""
    from jax.sharding import NamedSharding, SingleDeviceSharding

    from candle_vllm_tpu.ops.pallas.quant_matmul import dequant_w4_jnp
    from candle_vllm_tpu.ops.quant import grouped_quant_matmul

    def p(n):
        return params[f"{prefix}.experts.{n}"]

    g_off = p("gate_proj.qweight_offload")
    n_off = g_off.shape[0]
    E = group_sizes.shape[0]
    E_res = E - n_off
    R = xs.shape[0]
    if mesh is None:
        host = SingleDeviceSharding(
            jax.devices()[0], memory_kind="pinned_host"
        )
        dev = SingleDeviceSharding(jax.devices()[0], memory_kind="device")
    else:
        host = NamedSharding(mesh, P(), memory_kind="pinned_host")
        dev = NamedSharding(mesh, P(), memory_kind="device")

    # routed offloaded experts: fixed NSO slots (padding slots replicate
    # bank row 0 with an empty range)
    NSO = min(n_off, R)
    off_sizes = group_sizes[E_res:]
    (sel,) = jnp.nonzero(off_sizes > 0, size=NSO, fill_value=0)
    sel = sel.astype(jnp.int32)
    cs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(group_sizes).astype(jnp.int32)]
    )
    valid = jnp.arange(NSO) < jnp.sum(off_sizes > 0)
    lo = jnp.where(valid, cs[E_res + sel], 0)
    hi = jnp.where(valid, cs[E_res + sel + 1], 0)
    rows = jnp.arange(R, dtype=jnp.int32)
    sel_h = jax.device_put(sel, host)

    if tp > 1 and mesh is not None:
        return _moe_quant_offload_tp(
            xs, p, group_sizes[:E_res], sel_h, lo, hi, NSO, E_res,
            act, dtype, mesh,
        )

    # resident part: rows routed to offloaded experts sit at the sorted
    # tail, outside every resident group range -> contribute zero here
    if E_res > 0:
        gs_res = group_sizes[:E_res]
        g = grouped_quant_matmul(
            xs, p("gate_proj.qweight"), p("gate_proj.scales"), gs_res
        ).astype(jnp.float32)
        u = grouped_quant_matmul(
            xs, p("up_proj.qweight"), p("up_proj.scales"), gs_res
        ).astype(jnp.float32)
    else:
        OUT = p("gate_proj.scales_offload").shape[2]
        g = jnp.zeros((R, OUT), jnp.float32)
        u = jnp.zeros((R, OUT), jnp.float32)

    def fetch(name, i_h):
        bank = p(name)
        row = jax.lax.dynamic_slice_in_dim(bank, i_h, 1, axis=0)
        return jax.device_put(row, dev)[0]
    ws = []
    for j in range(NSO):
        i_h = sel_h[j]
        wg = dequant_w4_jnp(
            fetch("gate_proj.qweight_offload", i_h),
            fetch("gate_proj.scales_offload", i_h),
        ).astype(xs.dtype)
        wu = dequant_w4_jnp(
            fetch("up_proj.qweight_offload", i_h),
            fetch("up_proj.scales_offload", i_h),
        ).astype(xs.dtype)
        mask = ((rows >= lo[j]) & (rows < hi[j]))[:, None]
        g = g + jnp.where(mask, jnp.dot(xs, wg,
                          preferred_element_type=jnp.float32), 0.0)
        u = u + jnp.where(mask, jnp.dot(xs, wu,
                          preferred_element_type=jnp.float32), 0.0)
        ws.append((i_h, mask))

    h = (act(g) * u).astype(dtype)

    if E_res > 0:
        y = grouped_quant_matmul(
            h, p("down_proj.qweight"), p("down_proj.scales"), gs_res
        ).astype(jnp.float32)
    else:
        y = jnp.zeros((R, p("down_proj.scales_offload").shape[2]),
                      jnp.float32)
    for i_h, mask in ws:
        wd = dequant_w4_jnp(
            fetch("down_proj.qweight_offload", i_h),
            fetch("down_proj.scales_offload", i_h),
        ).astype(dtype)
        y = y + jnp.where(mask, jnp.dot(h, wd,
                          preferred_element_type=jnp.float32), 0.0)
    return y.astype(dtype)


def _moe_quant_offload_tp(
    xs: jnp.ndarray,            # [R, hidden] rows sorted by expert
    p,                          # name -> bank lookup
    gs_res: jnp.ndarray,        # [E_res] i32 resident group sizes
    sel_h: jnp.ndarray,         # [NSO] routed-offloaded ids (pinned host)
    lo: jnp.ndarray,            # [NSO] sorted-row range starts
    hi: jnp.ndarray,            # [NSO] sorted-row range ends
    NSO: int,
    E_res: int,
    act,
    dtype,
    mesh: Mesh,
) -> jnp.ndarray:
    """TP twin of the offloaded expert FFN (reference per-rank offload,
    models/mod.rs:445 + expert sharding distributed.rs:108-203).

    Stage A (GSPMD level): each routed offloaded expert's packed tiles
    are host->HBM DMA'd with their tp sharding intact — every device
    moves only its 1/tp of the bytes.  Stage B: ONE shard_map runs the
    column-parallel resident+offloaded gate/up, local activation, and
    row-parallel down with a single psum, so no bank (resident or
    offloaded) is ever replicated in HBM."""
    from jax.sharding import NamedSharding

    from candle_vllm_tpu.ops.pallas.quant_matmul import dequant_w4_jnp
    from candle_vllm_tpu.ops.quant import grouped_quant_matmul

    SP_CQ = P(None, "tp", None, None)   # gate/up qweight: OUT-tile shard
    SP_CS = P(None, None, "tp")         # gate/up scales: OUT shard
    SP_RQ = P(None, None, "tp", None)   # down qweight: IN shard
    SP_RS = P(None, "tp", None)         # down scales: IN-group shard

    def fetch(name, spec, i_h):
        row = jax.lax.dynamic_slice_in_dim(p(name), i_h, 1, axis=0)
        return jax.device_put(
            row, NamedSharding(mesh, spec, memory_kind="device")
        )[0]

    def bank(name, spec):
        return jnp.stack(
            [fetch(name, spec, sel_h[j]) for j in range(NSO)]
        )

    ogq = bank("gate_proj.qweight_offload", SP_CQ)
    ogs = bank("gate_proj.scales_offload", SP_CS)
    ouq = bank("up_proj.qweight_offload", SP_CQ)
    ous = bank("up_proj.scales_offload", SP_CS)
    odq = bank("down_proj.qweight_offload", SP_RQ)
    ods = bank("down_proj.scales_offload", SP_RS)

    if E_res > 0:
        res = (
            p("gate_proj.qweight"), p("gate_proj.scales"),
            p("up_proj.qweight"), p("up_proj.scales"),
            p("down_proj.qweight"), p("down_proj.scales"),
        )
        res_specs = (SP_CQ, SP_CS, SP_CQ, SP_CS, SP_RQ, SP_RS)
    else:
        res, res_specs = (), ()

    def local_body(xs_, ogq_, ogs_, ouq_, ous_, odq_, ods_,
                   gs_res_, lo_, hi_, *res_):
        R = xs_.shape[0]
        if E_res > 0:
            gq, gs, uq, us, dq, dsc = res_
            g = grouped_quant_matmul(xs_, gq, gs, gs_res_).astype(
                jnp.float32
            )
            u = grouped_quant_matmul(xs_, uq, us, gs_res_).astype(
                jnp.float32
            )
        else:
            g = jnp.zeros((R, ogs_.shape[-1]), jnp.float32)
            u = jnp.zeros((R, ogs_.shape[-1]), jnp.float32)
        rows = jnp.arange(R, dtype=jnp.int32)
        masks = []
        for j in range(NSO):
            wg = dequant_w4_jnp(ogq_[j], ogs_[j]).astype(xs_.dtype)
            wu = dequant_w4_jnp(ouq_[j], ous_[j]).astype(xs_.dtype)
            mask = ((rows >= lo_[j]) & (rows < hi_[j]))[:, None]
            g = g + jnp.where(mask, jnp.dot(
                xs_, wg, preferred_element_type=jnp.float32), 0.0)
            u = u + jnp.where(mask, jnp.dot(
                xs_, wu, preferred_element_type=jnp.float32), 0.0)
            masks.append(mask)
        h = (act(g) * u).astype(dtype)
        if E_res > 0:
            y = grouped_quant_matmul(h, dq, dsc, gs_res_).astype(
                jnp.float32
            )
        else:
            y = jnp.zeros((R, ods_.shape[-1]), jnp.float32)
        for j in range(NSO):
            wd = dequant_w4_jnp(odq_[j], ods_[j]).astype(dtype)
            y = y + jnp.where(masks[j], jnp.dot(
                h, wd, preferred_element_type=jnp.float32), 0.0)
        return jax.lax.psum(y, "tp")

    rep2 = P(None, None)
    y = jax.shard_map(
        local_body,
        mesh=mesh,
        in_specs=(rep2, SP_CQ, SP_CS, SP_CQ, SP_CS, SP_RQ, SP_RS,
                  P(None), P(None), P(None)) + res_specs,
        out_specs=rep2,
        check_vma=False,
    )(xs, ogq, ogs, ouq, ous, odq, ods, gs_res, lo, hi, *res)
    return y.astype(dtype)
