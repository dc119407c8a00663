"""Global precision / execution configuration.

TPU-first precision policy: the MXU natively computes f32 (bf16 inputs);
float64 is emulated and slow.  The reference library is double-precision
throughout, so accuracy parity (epsilon = 1e-6, golden complex128 data)
requires x64 — but the production TPU path should run f32 at epsilon ~1e-3
(cf. BASELINE.md stage configs).  Precision is therefore a first-class,
explicit knob rather than an ambient global.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np


def use_x64(enable: bool = True) -> None:
    """Enable/disable 64-bit JAX types (needed for reference-accuracy parity)."""
    jax.config.update("jax_enable_x64", enable)


@dataclasses.dataclass
class Config:
    """Framework-wide defaults. Mutable singleton accessed via get_config()."""

    # dtype used for real coefficient data when the caller does not specify
    real_dtype: np.dtype = dataclasses.field(default_factory=lambda: np.dtype(np.float64))
    complex_dtype: np.dtype = dataclasses.field(default_factory=lambda: np.dtype(np.complex128))
    # dtype for coordinates / geometry work on host
    coord_dtype: np.dtype = dataclasses.field(default_factory=lambda: np.dtype(np.float64))
    # padding granularity for block buckets (lane dim on TPU is 128; small
    # H-matrix leaves would waste enormously at 128, so we bucket by powers
    # of two and let XLA lay out the batch dim on the lanes instead)
    bucket_rounding: int = 2  # round block dims up to powers of this
    min_bucket_dim: int = 8
    # maximum ACA rank as a fraction of min(block dims); safety cap
    max_rank_ratio: float = 0.5
    # admissible blocks larger than this (either dim) are split further.
    # Uniform tile caps keep ACA reliable (bounded rank per block), bound
    # the number of distinct XLA compile shapes, and turn the matvec into
    # a few large batched GEMMs — the TPU-efficient shape of the format.
    # 1024 measured best at N=40000: 512 shatters the far field into ~13k
    # rank-8 tiles (overhead-bound matvec, ~2x the stored bytes); 2048
    # degrades compression and pushes single blocks past VMEM budgets.
    max_block_size: int = 1024
    # factorization: blocks up to this size densify-and-factor (exact);
    # larger ones use the level-batched HODLR Woodbury factorization
    # (ops/hodlr.py) built by randomized peeling through the fast matvec
    hodlr_threshold: int = 4096
    # DDM local-solver tier split (solvers/ddm.py facto_one_level):
    # subdomains up to this size use the batched dense LU — dense local
    # factorization is cheap and robust well past hodlr_threshold (a
    # (P, 6k, 6k) f32 batch is ~600 MB), while the hierarchical tier's
    # randomized peeling pays heavily when subdomain geometry is not
    # HODLR-friendly (volume clouds: measured ~8 min/subdomain at m=5000
    # vs seconds dense).  Above it, H-matrix subdomains stay compressed
    # and factor hierarchically (the reference's H-LU local solves).
    ddm_local_dense_max: int = 6144
    hodlr_leaf_size: int = 256
    hodlr_sample_size: int = 32
    hodlr_power_iters: int = 1
    # cap on the adaptive sample-doubling: a level whose off-diagonal rank
    # still saturates at this many samples raises HODLRRankSaturationError
    # (the factorization then falls back to the dense path) instead of
    # peeling toward k = m with dense-size probe batches
    hodlr_max_sample_size: int = 1024
    # HODLR build tolerance = hodlr_eps_factor * hmatrix.epsilon
    hodlr_eps_factor: float = 0.1
    # iterative-refinement sweeps per HODLR solve (x += F^-1 (b - A x),
    # residual through the fast bucketed matvec): each sweep multiplies the
    # solve error by ~cond(A) * hodlr_eps, recovering the reference's
    # rel-err < epsilon contract without driving HODLR ranks up
    hodlr_refine_iters: int = 2
    # assembly memory budget: batched device ops (ACA, QR/SVD truncation,
    # dense fills) are chunked over the block axis so that one chunk's
    # dominant operand stays under ~this many elements.  Chunk sizes are
    # powers of two, so XLA compiles are keyed by (chunk, pt, ps) and
    # bounded in number regardless of problem size.  2^28 elems = 1 GB of
    # f32 dominant operand — each call site divides by its own per-block
    # workspace multiplier, and chunk count directly multiplies the
    # per-chunk dispatch+sync latency (expensive over a remote TPU link).
    assembly_chunk_elems: int = 1 << 28
    # pre-warm the assembly's device programs from a thread pool before
    # the fill (hmatrix/assembly.py _warm_device_programs).  Default OFF:
    # measured on the remote TPU service, compiles/executable loads
    # serialize server-side, so the thread pool buys no concurrency and
    # pre-warming the SPECULATIVE stage-2 ladder programs (17 of the 22
    # headline-plan jobs) pays ~0.4-0.7 s each for programs most
    # assemblies never run — on-demand loading measured 20.3 s vs 25.4 s
    # warm-cache assembly at N=40000 (HTOOL_TPU_WARMUP=1 re-enables for
    # backends whose compile service parallelizes).
    assembly_warmup: bool = dataclasses.field(
        default_factory=lambda: os.environ.get("HTOOL_TPU_WARMUP", "0")
        == "1")
    # force ('pallas' | 'xla' | None=auto) the matvec kernel backend
    matvec_backend: str | None = None
    # lane-aligned low-rank Pallas layout (ops/matvec.py align_lowrank):
    # removes per-block rotates at ~+25% stored bytes.  Measured NET SLOWER
    # on the r04 batched kernel at N=40000 (2.8 vs 2.1 ms — the rotates are
    # not the bottleneck there), so off by default; kept as a tuning knob
    # for plans with many small blocks where rotate counts dominate.
    matvec_aligned_layout: bool = False
    # Pallas product kernel structure (TPU): 'fused' = one launch, all
    # buckets share the grid with byte-weighted windows; 'per_bucket' =
    # one launch per bucket, partial outputs summed by XLA (each launch
    # gets the whole VMEM window budget); 'seq' = per-bucket
    # emit_pipeline loops inside one launch (measured 3x off the DMA
    # rate — the emit_pipeline software scheduler costs ~11 us/step —
    # kept as a diagnostics mode).  ops/pallas_matvec.py.
    matvec_kernel_mode: str = "fused"
    # dense-tier DDM local solves: 'invert' precomputes explicit subdomain
    # inverses at facto time (one wide triangular solve) so each Krylov
    # iteration applies ONE batched GEMM — batched (P, m, m) triangular
    # solves per iteration are the TPU's slowest op (sequential row sweep,
    # ~0.7 s/iter at m ~ 5000, the r04 ddm_gmres bottleneck).  'solve'
    # keeps the factored form (less setup memory traffic).
    ddm_dense_apply: str = "invert"

    def default_dtype(self, is_complex: bool) -> np.dtype:
        return self.complex_dtype if is_complex else self.real_dtype


_CONFIG = Config()


def get_config() -> Config:
    return _CONFIG


def set_precision(mode: str) -> None:
    """Set the global precision mode: 'f32' (TPU production) or 'f64' (parity)."""
    cfg = get_config()
    if mode == "f32":
        cfg.real_dtype = np.dtype(np.float32)
        cfg.complex_dtype = np.dtype(np.complex64)
    elif mode == "f64":
        cfg.real_dtype = np.dtype(np.float64)
        cfg.complex_dtype = np.dtype(np.complex128)
        use_x64(True)
    else:
        raise ValueError(f"unknown precision mode {mode!r} (want 'f32' or 'f64')")


# Allow opting into x64 via environment for scripts/tests.
if os.environ.get("HTOOL_TPU_X64", "").lower() in ("1", "true", "yes"):
    use_x64(True)


def _machine_fingerprint() -> str:
    """Short hash of the host CPU's feature set.  XLA:CPU AOT executables
    are compiled FOR the build machine's features; loading one on a host
    with a different feature set SIGILLs/segfaults (observed: a shared
    cache dir written by a machine with +prefer-no-scatter crashed the
    test suite at load time).  Keying the cache dir on the fingerprint
    confines every entry to hosts that can actually execute it."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:  # pragma: no cover - non-Linux
        pass
    raw = f"{platform.machine()}|{flags}"
    return hashlib.sha1(raw.encode()).hexdigest()[:10]


def _enable_persistent_compilation_cache() -> None:
    """On-disk XLA compilation cache. Assembly compiles one program per
    bucket shape; over a remote TPU link each compile costs seconds, so
    caching across processes matters. min_entry_size must be forced to -1:
    some PJRT plugins report executable sizes that fall under the default
    threshold and nothing would ever be written."""
    cache_dir = os.environ.get("HTOOL_TPU_CACHE_DIR")
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "htool_python_tpu",
            "xla-" + _machine_fingerprint())
    if cache_dir == "":  # explicit opt-out
        return
    # Separate caches per requested platform set: a process attached to the
    # remote TPU may compile host-side CPU programs targeting a DIFFERENT
    # machine than a pure-CPU test process; mixing them in one directory
    # produced executables that segfault at load time.
    platforms = os.environ.get("JAX_PLATFORMS", "default") or "default"
    cache_dir = os.path.join(cache_dir, platforms.replace(",", "_"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # the jit-executable cache is content-addressed (one file per key,
        # written via temp+rename) and safe under concurrent processes; the
        # XLA-INTERNAL caches this knob would additionally enable (e.g. the
        # CPU AOT kernel cache) are single-writer files — concurrent test +
        # bench processes corrupted them, segfaulting later loads
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compilation_cache()
