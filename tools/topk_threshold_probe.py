"""Threshold-select top-k feasibility probe (VERDICT r04 item 2).

The r04 floor proof pinned the proposal stage's 7.47 ms top-k term to
`approx_max_k`'s internal exact sort of 131,072 candidates/image
(recall 0.95 only permits log2_reduction=1 at k=6000, n=262,144 —
`docs/prop_floor_r04.json`). This probe measures the components of the one
remaining named idea: EXACT selection via a sampled threshold —

  1. strided sample (A/64 elements) -> tiny exact top-k -> threshold t
     with ~2x over-selection margin;
  2. count pass (one compare+reduce over the batch);
  3. compaction of the ~12k above-threshold elements/image into a
     static (B, budget) buffer  [the open question: nonzero-lowering vs
     cumsum+scatter vs Pallas sequential-grid masked stores];
  4. exact `lax.top_k` over the compacted (B, budget) buffer — 16x fewer
     sorted elements than approx_max_k's 131k.

If sum(1..4) lands under ~3 ms the assembled path replaces approx_max_k
(and is EXACT — better parity than the 0.95-recall production knob); if
not, this file's numbers become negative result #21.

Distinct from negative results #2 (sequential per-image bisection — this
is one batched sampled threshold, no iteration), #18 (bf16 scores), #20
(strided-window pre-reduce — no windows here).

Usage: python tools/topk_threshold_probe.py --out docs/topk_threshold_r05.json
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def t(f, *a, iters=20):
    o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000


def thin(o):
    return [jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(o)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--anchors", type=int, default=261888)
    ap.add_argument("--k", type=int, default=6000)
    ap.add_argument("--budget", type=int, default=16384)
    ap.add_argument("--stride", type=int, default=64)
    ap.add_argument("--out", default="")
    ap.add_argument("--bench-ms", type=float, default=324.73,
                    help="pipelined batch step ms from BENCH (ceiling math)")
    ap.add_argument("--bench-topk-term-ms", type=float, default=7.47,
                    help="the stage's top-k term from the r04 floor proof")
    args = ap.parse_args()
    b, a, k, budget = args.batch, args.anchors, args.k, args.budget

    rng = np.random.default_rng(0)
    # clustered scores like a trained RPN (prop_floor_probe convention)
    base = rng.standard_normal((b, a)).astype(np.float32)
    hot = rng.choice(a, (b, 400))
    for i in range(b):
        base[i, hot[i]] += 6.0
    fg = jnp.asarray(base)

    report = {"batch": b, "anchors": a, "k": k, "budget": budget,
              "stride": args.stride}

    # baselines --------------------------------------------------------------
    f_approx = jax.jit(lambda s: thin(jax.vmap(
        lambda x: jax.lax.approx_max_k(x, k, recall_target=0.95))(s)))
    report["baseline_approx_ms"] = round(t(f_approx, fg), 2)
    f_exact = jax.jit(lambda s: thin(jax.vmap(
        lambda x: jax.lax.top_k(x, k))(s)))
    report["baseline_exact_ms"] = round(t(f_exact, fg), 2)

    # components -------------------------------------------------------------
    q = max(1, int(2.0 * k / args.stride))  # ~2x over-select margin

    def threshold(s):
        sample = s[:, ::args.stride]
        v, _ = jax.lax.top_k(sample, q)
        return v[:, -1:]  # (B, 1)

    report["q_samples"] = q
    f_thr = jax.jit(lambda s: thin(threshold(s)))
    report["threshold_ms"] = round(t(f_thr, fg), 2)

    def count(s):
        return (s >= threshold(s)).sum(axis=1)

    f_cnt = jax.jit(lambda s: thin(count(s)))
    report["threshold_count_ms"] = round(t(f_cnt, fg), 2)
    counts = np.asarray(jax.jit(count)(fg))
    report["count_min"] = int(counts.min())
    report["count_max"] = int(counts.max())

    # compaction A: nonzero(size=) lowering ---------------------------------
    def compact_nonzero(s):
        thr = threshold(s)
        mask = s >= thr
        idx = jax.vmap(lambda m: jnp.nonzero(m, size=budget,
                                             fill_value=a)[0])(mask)
        vals = jnp.where(
            idx < a,
            jnp.take_along_axis(s, jnp.minimum(idx, a - 1), axis=1),
            -jnp.inf)
        return vals, idx

    f_nz = jax.jit(lambda s: thin(compact_nonzero(s)))
    try:
        report["compact_nonzero_ms"] = round(t(f_nz, fg), 2)
    except Exception as e:  # lowering may be unsupported/slow-path
        report["compact_nonzero_ms"] = f"FAILED: {type(e).__name__}: {e}"

    # compaction B: cumsum + scatter-drop ------------------------------------
    def compact_scatter(s):
        thr = threshold(s)
        mask = s >= thr
        ranks = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        tgt = jnp.where(mask, ranks - 1, budget)  # drop out-of-range
        iota = jnp.broadcast_to(jnp.arange(a, dtype=jnp.int32), (b, a))
        out_v = jnp.full((b, budget), -jnp.inf, jnp.float32)
        out_i = jnp.zeros((b, budget), jnp.int32)
        out_v = jax.vmap(lambda o, tt, vv: o.at[tt].set(
            vv, mode="drop"))(out_v, tgt, s)
        out_i = jax.vmap(lambda o, tt, vv: o.at[tt].set(
            vv, mode="drop"))(out_i, tgt, iota)
        return out_v, out_i

    f_sc = jax.jit(lambda s: thin(compact_scatter(s)))
    try:
        report["compact_scatter_ms"] = round(t(f_sc, fg), 2)
    except Exception as e:
        report["compact_scatter_ms"] = f"FAILED: {type(e).__name__}: {e}"

    # cumsum alone (building block attribution)
    f_cs = jax.jit(lambda s: thin(jnp.cumsum(
        (s >= threshold(s)).astype(jnp.int32), axis=1)))
    report["cumsum_ms"] = round(t(f_cs, fg), 2)

    # final small top-k ------------------------------------------------------
    small = jnp.asarray(rng.standard_normal((b, budget)), jnp.float32)
    f_small = jax.jit(lambda s: thin(jax.vmap(
        lambda x: jax.lax.top_k(x, k))(s)))
    report["topk_budget_ms"] = round(t(f_small, small), 2)

    # assembled (best compaction) -------------------------------------------
    def assembled(s, compact):
        vals, idx = compact(s)
        v, p = jax.vmap(lambda x: jax.lax.top_k(x, k))(vals)
        sel = jnp.take_along_axis(idx, p, axis=1)
        return v, sel

    for name, compact in (("nonzero", compact_nonzero),
                          ("scatter", compact_scatter)):
        fa = jax.jit(lambda s, c=compact: thin(assembled(s, c)))
        try:
            report[f"assembled_{name}_ms"] = round(t(fa, fg), 2)
        except Exception as e:
            report[f"assembled_{name}_ms"] = (
                f"FAILED: {type(e).__name__}: {e}")

    # exactness check vs lax.top_k (order + indices)
    try:
        v_ref, i_ref = jax.jit(
            lambda s: jax.vmap(lambda x: jax.lax.top_k(x, k))(s))(fg)
        v_c, i_c = jax.jit(
            lambda s: assembled(s, compact_nonzero))(fg)
        report["exact_match_values"] = bool(
            np.array_equal(np.asarray(v_ref), np.asarray(v_c)))
        report["exact_match_indices"] = bool(
            np.array_equal(np.asarray(i_ref), np.asarray(i_c)))
    except Exception as e:
        report["exact_match_values"] = f"FAILED: {e}"

    # end-to-end ceiling arithmetic (negative-result #21 bookkeeping):
    # what the headline bench could gain if this stage term went to zero,
    # or to the best measured threshold path with compaction assumed free.
    base_ms, base_term = args.bench_ms, args.bench_topk_term_ms
    best_path = report["threshold_ms"] + report["topk_budget_ms"]
    report["ceiling_analysis"] = {
        "note": (f"from --bench-ms {base_ms} (pipelined batch-{b} step) "
                 f"and --bench-topk-term-ms {base_term}"),
        "zero_cost_topk_img_per_s": round(
            b / (base_ms - base_term) * 1000, 1),
        "best_measured_threshold_path_ms": round(best_path, 2),
        "best_measured_threshold_path_img_per_s": round(
            b / (base_ms - max(base_term - best_path, 0)) * 1000, 1),
    }
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
