"""Decompose the GPT-2 124M Q-update+apply cost into phases on the real TPU.

Phases of the Q0.5EQ1.5 whiten update (precond/kron.py:_whiten_q05eq15):
  exprP : Pg = einsum(subs_p, conj(Q).., Q.., g)      [fit-side apply]
  term1 : per-factor exprGs contractions of Pg
  ns    : dense-factor tail (bound + L + step + Procrustes), Pallas or XLA
  diag  : diagonal-factor updates (elementwise)
  apply : precond_grad on the (new) Q                  [update-side apply]

Timing: slope method between two fori_loop lengths, all results checksummed
and loop-carried (see memory: axon ~25 ms/call latency, DCE traps).
Per-phase FLOPs from XLA cost_analysis of the single-iteration program.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from psgd_torch_tpu.models import gpt2
from psgd_torch_tpu.precond import kron as kron_p
from psgd_torch_tpu.optim import transforms as T

PEAK = 197e12  # v5e bf16


def log(*a):
    print(*a, flush=True)


def slope_time(make_loop, args, n1=8, n2=64):
    f1, f2 = jax.jit(make_loop(n1)), jax.jit(make_loop(n2))
    float(f1(*args))  # compile+warm
    float(f2(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(f1(*args)); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2(*args)); tb = time.perf_counter() - t0
        best = min(best, (tb - ta) / (n2 - n1))
    return max(best, 0.0)


def flops_of(fn, *args):
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return float("nan")


def cksum(tree):
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(tree))


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    cfg = gpt2.gpt2_124m(compute_dtype=jnp.bfloat16)
    key = jax.random.key(0)
    params = gpt2.init_gpt2(key, cfg)
    mask = gpt2.scanned_layers_mask(params)
    tokens, targets = gpt2.synthetic_lm_batch(jax.random.fold_in(key, 1),
                                              4, cfg.block_size, cfg.vocab_size)
    grads = jax.jit(jax.grad(lambda p, x, y: gpt2.loss_gpt2(p, x, y, cfg)))(
        params, tokens, targets)

    qdt = jnp.bfloat16
    max_skew = 2.0
    leaves = jax.tree_util.tree_leaves(grads)
    flags = [bool(f) for f in jax.tree_util.tree_leaves(mask)]
    plans = [kron_p.make_kron_plan(
        T._squeezed_shape(g.shape[1:] if f else g.shape), float("inf"),
        max_skew, "Q0.5EQ1.5") for g, f in zip(leaves, flags)]
    states = [T._init_kron_leaf(p, 1.0, qdt, f, l.shape[0] if f else 1)
              for p, l, f in zip(plans, leaves, flags)]
    gs = [g.astype(qdt).reshape(((g.shape[0],) if f else ()) + p.shape)
          for g, f, p in zip(leaves, flags, plans)]

    def perturb(x, acc):
        # loop-carry: multiply by a dynamic (1 + 0*acc) so nothing hoists
        return x * (1.0 + 0.0 * acc).astype(x.dtype)

    # ---- phase: exprP over all leaves -------------------------------------
    def mk_exprp(n):
        def run(states_in, gs_in):
            def body(_, carry):
                acc, = carry
                tot = jnp.zeros((), jnp.float32)
                for st, plan, f, g in zip(states_in, plans, flags, gs):
                    gg = perturb(g, acc)
                    if f:
                        pg = jax.vmap(lambda s, x: kron_p.precond_grad(s, plan, x))(st, gg)
                    else:
                        pg = kron_p.precond_grad(st, plan, gg)
                    tot = tot + jnp.sum(pg.astype(jnp.float32))
                return (tot,)
            (acc,) = jax.lax.fori_loop(0, n, body, (jnp.zeros((), jnp.float32),))
            return acc
        return run

    # one-iteration flops
    def one_exprp(states_in, gs_in):
        outs = []
        for st, plan, f, g in zip(states_in, plans, flags, gs_in):
            if f:
                outs.append(jax.vmap(lambda s, x: kron_p.precond_grad(s, plan, x))(st, g))
            else:
                outs.append(kron_p.precond_grad(st, plan, g))
        return cksum(outs)

    # precompute Pg for term1 phase
    pgs = jax.jit(lambda s, g: [
        jax.vmap(lambda ss, x: kron_p.precond_grad(ss, p, x))(st, gg) if f
        else kron_p.precond_grad(st, p, gg)
        for st, p, f, gg in zip(s, plans, flags, g)])(states, gs)

    # ---- phase: term1 (all factors, incl. diag) ---------------------------
    def term1_all(pgs_in, acc):
        tot = jnp.zeros((), jnp.float32)
        for plan, f, pg in zip(plans, flags, pgs_in):
            pg = perturb(pg, acc)
            for i in range(len(plan.is_diag)):
                fn = lambda x: jnp.einsum(plan.subs_gs[i], x, jnp.conj(x))
                t1 = jax.vmap(fn)(pg) if f else fn(pg)
                tot = tot + jnp.sum(t1.astype(jnp.float32))
        return tot

    def mk_term1(n):
        def run(pgs_in):
            def body(_, carry):
                (acc,) = carry
                return (term1_all(pgs_in, acc),)
            (acc,) = jax.lax.fori_loop(0, n, body, (jnp.zeros((), jnp.float32),))
            return acc
        return run

    # precompute term1s for the NS phase (dense factors only)
    def dense_term1s(pgs_in):
        out = []
        for plan, f, pg, st in zip(plans, flags, pgs, states):
            for i, diag in enumerate(plan.is_diag):
                if diag:
                    continue
                fn = lambda x: jnp.einsum(plan.subs_gs[i], x, jnp.conj(x))
                t1 = jax.vmap(fn)(pg) if f else fn(pg)[None]
                q = st.q[i] if f else st.q[i][None]
                lips = st.lips[i] if f else st.lips[i][None]
                t2 = plan.numel / plan.shape[i]
                out.append((t1, q, lips.astype(jnp.float32),
                            jnp.full((t1.shape[0],), t2, jnp.float32)))
        return out

    nst = jax.jit(dense_term1s)(pgs)
    nst = jax.tree_util.tree_map(lambda x: x, nst)
    log("dense factor groups: " + ", ".join(
        f"{t[0].shape[0]}x{t[0].shape[1]}" for t in nst))

    # ---- phase: NS tail (fused kernel on each dense factor stack) ---------
    from psgd_torch_tpu.ops.pallas_kernels import fused_ns_update

    def ns_all(nst_in, acc, seed_base):
        tot = jnp.zeros((), jnp.float32)
        tot_l = jnp.zeros((), jnp.float32)
        for j, (t1, q, lips, t2) in enumerate(nst_in):
            t1 = perturb(t1, acc)
            b = t1.shape[0]
            s1 = seed_base + jnp.arange(b, dtype=jnp.int32) + 977 * j
            seeds = jnp.stack([s1, s1 + 31337], -1)
            nq, nl = fused_ns_update(t1, q, lips, t2, seeds, 0.1, 0.9, k=128)
            tot = tot + jnp.sum(nq.astype(jnp.float32))
            tot_l = tot_l + jnp.sum(nl)
        return tot + tot_l

    def mk_ns(n):
        def run(nst_in):
            def body(i, carry):
                (acc,) = carry
                return (ns_all(nst_in, acc, i),)
            (acc,) = jax.lax.fori_loop(0, n, body, (jnp.zeros((), jnp.float32),))
            return acc
        return run

    # ---- XLA (non-pallas) NS tail for comparison --------------------------
    def ns_all_xla(nst_in, acc, seed_base):
        from psgd_torch_tpu.ops.linalg import norm_lower_bound_spd, procrustes_step2
        tot = jnp.zeros((), jnp.float32)

        def one(t1, q, lips, t2, key):
            ell = norm_lower_bound_spd(t1, key, k=128) + t2
            lip = jnp.maximum(0.9 * lips + 0.1 * ell, ell)
            fq = q - (0.1 / lip).astype(q.dtype) * (t1 @ q - t2.astype(q.dtype) * q)
            fq = procrustes_step2(fq, jax.random.fold_in(key, 7), norm_k=128)
            return fq, lip

        for j, (t1, q, lips, t2) in enumerate(nst_in):
            t1 = perturb(t1, acc)
            b = t1.shape[0]
            keys = jax.vmap(lambda i: jax.random.fold_in(
                jax.random.key(11 + j), i + seed_base))(jnp.arange(b))
            nq, nl = jax.vmap(one)(t1, q.astype(t1.dtype) if q.dtype != t1.dtype else q,
                                   lips, t2, keys)
            tot = tot + jnp.sum(nq.astype(jnp.float32)) + jnp.sum(nl)
        return tot

    def mk_ns_xla(n):
        def run(nst_in):
            def body(i, carry):
                (acc,) = carry
                return (ns_all_xla(nst_in, acc, i),)
            (acc,) = jax.lax.fori_loop(0, n, body, (jnp.zeros((), jnp.float32),))
            return acc
        return run

    # ---- phase: full update (reference point) -----------------------------
    tx = T.scale_by_kron_whiten(preconditioner_max_skew=max_skew,
                                preconditioner_init_scale=1.0,
                                preconditioner_dtype=qdt, norm_k=128,
                                scanned_layers=mask)
    st0 = tx.init(params)

    def mk_full(n):
        def run(grads_in, state_in):
            def body(_, carry):
                s, acc = carry
                u, s = tx.update(grads_in, s)
                return s, acc + cksum(u)
            s, acc = jax.lax.fori_loop(0, n, body, (state_in, jnp.zeros((), jnp.float32)))
            return acc + cksum(s.precond)
        return run

    results = {}
    t = slope_time(mk_exprp, (states, gs)); results["exprP"] = t
    f = flops_of(one_exprp, states, gs)
    log(f"exprP : {t*1e6:8.0f} us  {f/1e9:7.1f} GF  MFU {f/t/PEAK*100:5.1f}%")

    t = slope_time(mk_term1, (pgs,)); results["term1"] = t
    f = flops_of(lambda p: term1_all(p, jnp.zeros((), jnp.float32)), pgs)
    log(f"term1 : {t*1e6:8.0f} us  {f/1e9:7.1f} GF  MFU {f/t/PEAK*100:5.1f}%")

    t = slope_time(mk_ns, (nst,)); results["ns_pallas"] = t
    f = flops_of(lambda p: ns_all(p, jnp.zeros((), jnp.float32),
                                  jnp.zeros((), jnp.int32)), nst)
    log(f"ns(pl): {t*1e6:8.0f} us  {f/1e9:7.1f} GF  MFU {f/t/PEAK*100:5.1f}%")

    t = slope_time(mk_ns_xla, (nst,)); results["ns_xla"] = t
    f = flops_of(lambda p: ns_all_xla(p, jnp.zeros((), jnp.float32),
                                      jnp.zeros((), jnp.int32)), nst)
    log(f"ns(xla): {t*1e6:7.0f} us  {f/1e9:7.1f} GF  MFU {f/t/PEAK*100:5.1f}%")

    t = slope_time(mk_full, (grads, st0)); results["full"] = t
    log(f"full  : {t*1e6:8.0f} us   (exprP x2 + term1 + ns + diag + misc)")

    known = results["exprP"] * 2 + results["term1"] + results["ns_pallas"]
    log(f"sum of phases (exprP*2+term1+ns): {known*1e6:.0f} us; "
        f"unaccounted: {(results['full']-known)*1e6:.0f} us")


if __name__ == "__main__":
    main()
