"""Round-5 kernel-body experiments: candidate redesigns for the fused
matvec kernel, measured head-to-head on synthetic single-bucket data.

Round-4 attribution (profile_matvec3/4 + README) says the ~2.1 ms N=40000
product is NOT term-math-bound (skip_term saves 0.03 ms): the cost is the
~50k small per-block vector ops (gather slice+stack, RMW accumulate) and
the pipeline's per-step buffer bookkeeping.  Candidates:

  * take-gather:  jnp.take_along_axis on an (8, L) replicated x gathers 8
    blocks' segments in ONE op (Mosaic tpu.DynamicGather) instead of 8
    slice+roll+stack sequences.
  * cross-GEMM:   per-step block math as TWO full-occupancy MXU GEMMs
    (block-diagonal formulation): W' = V_flat (G*r, ps) @ X^T (ps, G),
    mask-select the diagonal blocks, Y = w_bd (G, G*r) @ U_flat (G*r, pt).
  * static-accum bound, stream floor.

Single lr bucket (r=16, pt=ps=256) and single dense bucket (128x128),
k=1, ~384 MB each, real-chip timing via the rep-differencing chain.
Writes tools/profile_matvec5_result.json.

Usage: python tools/profile_matvec5.py [--cpu]   (--cpu = interpret-mode
numeric validation at tiny size; no timing)
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPU = "--cpu" in sys.argv

if CPU:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from profile_matvec import _chain_time  # noqa: E402


def _win(width):
    return -(-(width + 128) // 128) * 128


def _load_seg(x_ref, off, width):
    W = _win(width)
    base = pl.multiple_of((off // 128) * 128, 128)
    win = x_ref[:, pl.ds(base, W)]
    sh = off - base
    return pltpu.roll(win, W - sh, 1)[:, :width]


def _accum_seg(y_ref, off, width, acc):
    W = _win(width)
    base = pl.multiple_of((off // 128) * 128, 128)
    win = y_ref[:, pl.ds(base, W)]
    buf = jnp.pad(acc, ((0, 0), (0, W - acc.shape[1])))
    sh = off - base
    y_ref[:, pl.ds(base, W)] = win + pltpu.roll(buf, sh, 1)


def _accum_static(y_ref, off, width, acc):
    y_ref[:, :width] = y_ref[:, :width] + acc


# ---------------------------------------------------------------------
# kernel bodies: each takes (meta_ref, blk_ref, x state, y_ref-writer)
# and processes one grid step of G blocks.  Data layout: one merged slab
# per step, (G, rows, W) where lr rows = 2r ([Ut | V]) and dense rows=pt.
# ---------------------------------------------------------------------

def _gather_rolls(x_ref, meta_ref, j0, G, width):
    """(G, width) via per-block slice+roll+stack (the r04 body)."""
    segs = [_load_seg(x_ref, meta_ref[j0 + g], width) for g in range(G)]
    return jnp.concatenate(segs, axis=0)


def _gather_take(x8_ref, meta_ref, j0, G, width):
    """(G, width) via take_along_axis on the (8, L) replicated x: one
    dynamic-gather per 8 blocks.  The (8, width) index tile is built from
    the 8 scalar offsets with sublane-select adds (no 1-D vectors)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, width), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, width), 0)
    tiles = []
    for g0 in range(0, G, 8):
        idx = lane
        for i in range(8):
            idx = idx + jnp.where(sub == i, meta_ref[j0 + g0 + i], 0)
        tiles.append(jnp.take_along_axis(x8_ref[...], idx, axis=1))
    return jnp.concatenate(tiles, axis=0)


def _term_vpu_lr(slab, xg1, r, pt, ps):
    """r04 VPU body: xg1 (G, 1, ps) -> (G, pt)."""
    Ut, V = slab[:, :r, :pt], slab[:, r:, :ps]
    w = jnp.sum(V * xg1, axis=-1)                      # (G, r)
    return jnp.sum(Ut * w[:, :, None], axis=1)         # (G, pt)


def _term_xgemm_lr(slab, xg, r, pt, ps):
    """cross-GEMM body: xg (G, ps) -> (G, pt) via two MXU GEMMs."""
    G = xg.shape[0]
    Ut = slab[:, :r, :pt].reshape(G * r, pt)
    V = slab[:, r:, :ps].reshape(G * r, ps)
    Wp = jax.lax.dot_general(V, xg.T, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (G*r, G)
    row_g = jax.lax.broadcasted_iota(jnp.int32, (G * r, G), 0) // r
    col_g = jax.lax.broadcasted_iota(jnp.int32, (G * r, G), 1)
    w_col = jnp.sum(jnp.where(row_g == col_g, Wp, 0.0), axis=1,
                    keepdims=True)                      # (G*r, 1)
    # w_bd (G, G*r): w_col broadcast along the G rows, masked to own block
    m_row = jax.lax.broadcasted_iota(jnp.int32, (G, G * r), 0)
    m_col = jax.lax.broadcasted_iota(jnp.int32, (G, G * r), 1) // r
    w_bd = jnp.where(m_row == m_col, w_col.reshape(1, G * r), 0.0)
    return jax.lax.dot_general(w_bd, Ut, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (G, pt)


def _term_vpu_dense(slab, xg1, pt, ps):
    return jnp.sum(slab * xg1, axis=-1)                # (G, pt)


def _term_xgemm_dense(slab, xg, pt, ps):
    G = xg.shape[0]
    D = slab.reshape(G * pt, ps)
    Yp = jax.lax.dot_general(D, xg.T, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (G*pt, G)
    row_g = jax.lax.broadcasted_iota(jnp.int32, (G * pt, G), 0) // pt
    col_g = jax.lax.broadcasted_iota(jnp.int32, (G * pt, G), 1)
    y_col = jnp.sum(jnp.where(row_g == col_g, Yp, 0.0), axis=1,
                    keepdims=True)                      # (G*pt, 1)
    return y_col.reshape(G, pt)


def make_kernel(kind, gather, term, accum, G, r, pt, ps, resident):
    """kind: 'lr' | 'dense'; gather: 'roll' | 'take' | 'none';
    term: 'vpu' | 'xgemm' | 'skip'; accum: 'roll' | 'static' | 'skip'."""

    def kernel(meta_ref, blk_ref, *rest):
        i = pl.program_id(0)
        if resident:
            x_hbm, y_hbm, x_ref, x8_ref, y_ref, sem_in, sem_out = rest
        else:
            x_in, y_ref = rest
            x_ref = x_in
            x8_ref = None

        if resident:
            @pl.when(i == 0)
            def _():
                cp = pltpu.make_async_copy(x_hbm, x_ref, sem_in)
                cp.start()
                cp.wait()
                if gather == "take":
                    x8_ref[:] = jnp.broadcast_to(x_ref[...], x8_ref.shape)
                y_ref[:] = jnp.zeros_like(y_ref)
        else:
            @pl.when(i == 0)
            def _():
                y_ref[:] = jnp.zeros_like(y_ref)
            if gather == "take":
                x8_ref = None  # interpret: build on the fly

        nb_pad_steps = pl.num_programs(0)
        j0 = i * G
        slab = blk_ref[...]
        in_w = ps
        out_w = pt

        if gather == "roll":
            xg = _gather_rolls(x_ref, meta_ref, G * nb_pad_steps * 0 + j0,
                               G, in_w)
        elif gather == "take":
            src = x8_ref if x8_ref is not None else None
            if src is None:
                xbig = jnp.broadcast_to(x_ref[...], (8,) + x_ref.shape[1:])

                class _W:  # interpret-mode stand-in for the (8, L) scratch
                    def __getitem__(self, s):
                        return xbig[s]
                src = _W()
            xg = _gather_take(src, meta_ref, j0, G, in_w)
        else:
            xg = jnp.zeros((G, in_w), jnp.float32)

        if term == "vpu":
            if kind == "lr":
                out = _term_vpu_lr(slab, xg[:, None, :], r, pt, ps)
            else:
                out = _term_vpu_dense(slab, xg[:, None, :], pt, ps)
        elif term == "xgemm":
            if kind == "lr":
                out = _term_xgemm_lr(slab, xg, r, pt, ps)
            else:
                out = _term_xgemm_dense(slab, xg, pt, ps)
        else:
            out = xg[:, :out_w] + jnp.sum(slab) * 1e-30

        if accum != "skip":
            acc_fn = _accum_seg if accum == "roll" else _accum_static
            nb = G * nb_pad_steps
            for g in range(G):
                acc_fn(y_ref, meta_ref[nb + j0 + g], out_w,
                       out[g:g + 1])

        if resident:
            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                cp = pltpu.make_async_copy(y_ref, y_hbm, sem_out)
                cp.start()
                cp.wait()

    return kernel


def launch(kind, gather, term, accum, slabs, offs, x, L, G, r, pt, ps,
           interpret):
    nb = slabs.shape[0]
    steps = nb // G
    rows = slabs.shape[1]
    meta = jnp.concatenate([jnp.asarray(offs[1], jnp.int32),
                            jnp.asarray(offs[0], jnp.int32)])  # s then t
    resident = not interpret
    in_specs = [pl.BlockSpec((G, rows, slabs.shape[2]),
                             lambda i, *_: (i, 0, 0))]
    if resident:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        out_specs = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [pltpu.VMEM((1, L), jnp.float32),
                   pltpu.VMEM((8, L), jnp.float32),
                   pltpu.VMEM((1, L), jnp.float32),
                   pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    else:
        in_specs.append(pl.BlockSpec((1, L), lambda i, *_: (0, 0)))
        out_specs = pl.BlockSpec((1, L), lambda i, *_: (0, 0))
        scratch = []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(steps,), in_specs=in_specs,
        out_specs=out_specs, scratch_shapes=scratch)
    return pl.pallas_call(
        make_kernel(kind, gather, term, accum, G, r, pt, ps, resident),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=114 * 1024 * 1024),
        interpret=interpret,
    )(meta, slabs, x)


def reference(kind, slabs, offs, x, L, r, pt, ps):
    t_off, s_off = offs
    y = np.zeros(L, np.float64)
    for g in range(slabs.shape[0]):
        xs = x[0, s_off[g]:s_off[g] + ps]
        if kind == "lr":
            Ut = slabs[g, :r, :pt]
            V = slabs[g, r:, :ps]
            y[t_off[g]:t_off[g] + pt] += Ut.T @ (V @ xs)
        else:
            y[t_off[g]:t_off[g] + pt] += slabs[g, :, :ps] @ xs
    return y


def build_case(kind, total_mb, L, G, r, pt, ps, rng):
    if kind == "lr":
        per = 2 * r * max(pt, ps) * 4
        rows = 2 * r
    else:
        per = pt * ps * 4
        rows = pt
    nb = (total_mb << 20) // per
    nb = (nb // G) * G
    slabs = rng.standard_normal((nb, rows, max(pt, ps))).astype(np.float32)
    t_off = rng.integers(0, L - pt - 256, nb).astype(np.int32)
    s_off = rng.integers(0, L - ps - 256, nb).astype(np.int32)
    return jnp.asarray(slabs), (t_off, s_off), nb * per


def main():
    interpret = CPU
    rng = np.random.default_rng(0)
    L = 40960
    results = {}

    t0 = time.perf_counter()
    float(jnp.sum(jnp.zeros(8)))
    print(f"session setup {time.perf_counter() - t0:.1f}s", flush=True)

    # --- probe: does take_along_axis lower in a TPU pallas kernel? ---
    take_ok = True
    if not interpret:
        def probe_kernel(x_ref, idx_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=1)
        try:
            xp = jnp.arange(8 * 1024, dtype=jnp.float32).reshape(8, 1024)
            ip = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32), (8, 256))
            out = pl.pallas_call(
                probe_kernel,
                out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
            )(xp, ip + 3)
            ok = np.allclose(np.asarray(out[0]), np.arange(3, 259))
            take_ok = bool(ok)
            results["take_probe"] = "ok" if ok else "wrong-values"
        except Exception as e:
            take_ok = False
            results["take_probe"] = f"unsupported: {repr(e)[:200]}"
        print(f"take probe: {results['take_probe']}", flush=True)

    total_mb = 4 if interpret else 384
    cases = [
        ("lr", 16, 256, 256, 32),
        ("dense", 0, 128, 128, 16),
    ]
    variants = [
        ("base", "roll", "vpu", "roll"),
        ("xgemm", "roll", "xgemm", "roll"),
        ("take_xgemm", "take", "xgemm", "roll"),
        ("take_xgemm_sacc", "take", "xgemm", "static"),
        ("xgemm_sacc", "roll", "xgemm", "static"),
        ("stream", "none", "skip", "skip"),
    ]
    for kind, r, pt, ps, G in cases:
        slabs, offs, stored = build_case(kind, total_mb, L, G, r, pt, ps,
                                         rng)
        x = jnp.asarray(rng.standard_normal((1, L)).astype(np.float32))
        if interpret:
            ref = reference(kind, np.asarray(slabs), offs, np.asarray(x),
                            L, r, pt, ps)
        key = f"{kind}"
        results[key] = {"stored_mb": stored >> 20, "nb": slabs.shape[0]}
        for name, gather, term, accum, in variants:
            if gather == "take" and not take_ok:
                results[key][name] = "skipped: take unsupported"
                continue
            fn = partial(launch, kind, gather, term, accum)
            try:
                if interpret:
                    if accum == "static" or term == "skip":
                        continue
                    y = np.asarray(fn(slabs, offs, x, L, G, r, pt, ps,
                                      True))[0]
                    err = (np.linalg.norm(y - ref)
                           / max(np.linalg.norm(ref), 1e-30))
                    results[key][name] = {"rel_err": float(err)}
                    print(f"{kind}/{name}: rel_err {err:.2e}", flush=True)
                else:
                    def tfn(d, xv, fn=fn):
                        return fn(d, offs, xv, L, G, r, pt, ps, False)
                    t = _chain_time(jax, jnp, tfn, slabs, x)
                    gbs = stored / t / 1e9
                    results[key][name] = {"ms": round(t * 1e3, 3),
                                          "GBs": round(gbs, 1)}
                    print(f"{kind}/{name}: {t*1e3:7.3f} ms {gbs:6.1f} GB/s",
                          flush=True)
            except Exception as e:
                results[key][name] = f"ERROR: {repr(e)[:200]}"
                print(f"{kind}/{name}: ERROR {repr(e)[:150]}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_matvec5_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
