"""Render configuration and per-frame splatting arguments.

Mirrors the reference's ``SplattingArgs`` / ``SplattingArgsUniform``
(``/root/reference/src/renderer.rs:585-674``) plus TPU-specific rasterizer
tuning knobs that have no reference counterpart (tile size, binning slots,
sort backend) because the reference uses hardware rasterization.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

# Reference: DEFAULT_KERNEL_SIZE (/root/reference/src/renderer.rs:601)
DEFAULT_KERNEL_SIZE: float = 0.3

# Reference: fragment cutoff sqrt(log(255)) (/root/reference/src/shaders/gaussian.wgsl:2)
CUTOFF: float = 2.3539888583335364


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static (compile-time) configuration of the TPU tile rasterizer.

    These are baked into the jitted frame function; changing them triggers
    recompilation.  They replace the reference's shader-specialization
    constants (string-injected, /root/reference/src/renderer.rs:379-392).
    """

    # Screen tile dimensions in pixels.  tile_w * tile_h must be a multiple
    # of 128 (the VPU lane count).  32x32 measured fastest for the scan/
    # monomial kernel at bonsai scale (raster 9.11 ms and the LOWEST
    # instance count 1.79M vs: 9.50/2.15M at 16x32, 9.97/2.15M at 32x16,
    # 11.8/1.92M at 64x16, 14.4/1.55M at 64x32 — past 1024 px/tile the
    # per-splat pixel work dominates, below it the instance count and its
    # sort cost do).
    tile_w: int = 32
    tile_h: int = 32

    # Maximum number of tile instances each splat may emit during binning
    # (the sort size is N * tile_slots).  Splats whose screen-space extent
    # covers more tiles emit their first tile_slots rect tiles here and the
    # REST through the overflow pass (below), which restores the reference's
    # unbounded per-splat coverage (gaussian.wgsl:47-53).  With overflow
    # disabled, oversized splats emit their CENTER-OUT highest-contribution
    # tiles and drop the periphery (ops/preprocess.py iter_slots).
    tile_slots: int = 6

    # Overflow pass for clamped splats (fused-frontend path only): the
    # frontend emits the compacted indices of splats with n_rect > tile_slots
    # (typically <1%); the renderer gathers just those and emits their
    # remaining rect tiles (row-major ranks tile_slots..overflow_slots) in a
    # cheap XLA pass concatenated into the stream before the sort.
    # overflow_capacity = max clamped splats handled per frame (static;
    # excess splats keep only their first tile_slots tiles); 0 disables.
    # overflow_slots = per-splat coverage of the WALK stage incl. the main
    # pass; splats with bigger rects ("giants", e.g. a screen-filling floor
    # gaussian) get FULL dense-grid coverage for up to
    # overflow_grid_capacity of them — so coverage is unbounded, like the
    # reference's quads, for every realistic frame.
    # Sizing (remeasured round 4, synthetic bonsai 1.24M splats at
    # 1200x799 with trained-scene scale stats): 26,153 visible splats carry
    # n_rect > 6 and 1,240 carry n_rect > 32 — the round-3 defaults
    # (8192 / 128) silently truncated ~18k clamped splats to their first 6
    # row-major tiles, a 20 dB full-scale PSNR failure the residual
    # diagnostic did not count (it only saw giants among the captured
    # 8192).  overflow_capacity is now a ceiling; the effective per-scene
    # capacity scales as ~n/24 (overflow_capacity_for), and the residual
    # diagnostic counts EVERY splat that lost coverage.
    overflow_capacity: int = 1 << 20
    overflow_slots: int = 32
    overflow_grid_capacity: int = 2048

    @property
    def overflow_enabled(self) -> bool:
        return self.overflow_capacity > 0 and self.overflow_slots > self.tile_slots

    def overflow_capacity_for(self, n: int) -> int:
        """Effective clamped-splat capacity for an n-splat cloud: measured
        clamped fraction is ~3% of splats at bonsai scale (trained-scene
        size statistics), so ~n/24 (~4.2%) leaves margin; scenes up to 2048
        splats get capacity n outright (synthetic/test scenes can be 100%
        clamped — every splat huge — and are cheap either way).  nonzero
        num_clamped in the frame diagnostics is the resize signal."""
        full_small = min(-(-n // 128) * 128, 2048)
        return min(
            self.overflow_capacity,
            max(full_small, -(-n // (24 * 128)) * 128),
        )

    # Rank ceiling of the giant WINDOW stage (overflow_emit): giants
    # (n_rect > overflow_slots) get a row-major rank walk over their
    # GATHERED rows up to this rank; only splats beyond it (57 of 1.24M at
    # bonsai scale, measured) fall to the dense per-tile grid.  This keeps
    # the candidate stream ~2x smaller than a dense grid for every giant
    # (the grid's n_tiles * capacity rows dominated the overflow cost).
    overflow_window_slots: int = 160

    def overflow_grid_capacity_for(self, capacity_c: int) -> int:
        """Effective giant WINDOW capacity (splats with n_rect >
        overflow_slots), scaled with the clamped-splat capture capacity:
        measured ~1/21 of clamped splats exceed 32 tiles at bonsai scale,
        so capacity_c/16 leaves margin.  nonzero num_clamped diagnostics
        signal undersizing."""
        if self.overflow_grid_capacity <= 0:
            return 0
        return min(self.overflow_grid_capacity, max(128, capacity_c // 16))

    def overflow_dense_capacity_for(self, capacity_c: int) -> int:
        """Effective DENSE-grid capacity (splats with n_rect >
        overflow_window_slots — the extreme tail: 57 at bonsai scale vs
        capacity_c/256 = 203): the n_tiles * g2 candidate rows this
        allocates are the most expensive per splat, so the class is kept
        small; nonzero num_clamped diagnostics signal undersizing."""
        if self.overflow_grid_capacity <= 0:
            return 0
        return min(self.overflow_grid_capacity, max(64, capacity_c // 256))

    # In-kernel overflow (ops/overflow_pallas.py, TPU fused path only)
    # INSTANCE capacities.  The kernel streams are exact-cursor compacted,
    # so the sort ladder pays only for real instances — but the arrays'
    # static size still sets the sort's ladder modulus m (rung granularity
    # = m/16) and the splice-copy bandwidth, so worst-case sizing
    # (cap_c * 26 = 1.35M rows at bonsai scale) measurably LOSES: it
    # inflated m to 4.3M and the rung quantization ate the entire emit
    # saving (TPU, round 5).  Instead: ~4x margin over the measured real
    # counts (bench camera: 99k walk instances from 26k clamped splats =
    # 3.8 avg; 9.3k window instances), floored at 65536 so small scenes
    # keep full worst-case coverage.  Overruns DROP overflow instances
    # (never main-pass ones) and are counted in num_dropped.
    overflow_walk_factor: int = 8

    def overflow_walk_capacity_for(self, capacity_c: int) -> int:
        worst = (self.overflow_slots - self.tile_slots) * capacity_c
        return min(worst, max(capacity_c * self.overflow_walk_factor, 65536))

    def overflow_window_capacity_for(self, g_cap: int) -> int:
        worst = (self.overflow_window_slots - self.overflow_slots) * g_cap
        return min(worst, max(g_cap * 32, 65536))

    # Compacted capacity of the dense extreme-tail stage under the kernel
    # overflow path (the raw (n_tiles * g2) candidate grid is ~193k rows
    # for ~1k real instances at bonsai scale; compacting it keeps the
    # ladder bound tight).  Measured real: 908.
    overflow_dense_compact: int = 16384

    # Instance padding granularity (= the Pallas rasterizer DMA chunk).
    chunk_size: int = 1024

    # Alpha-aware instance bounds: a splat's tile rect / reach test use the
    # tightest quadratic-form level a_max = min(2*CUTOFF, log(opacity/thr))
    # at which its PEAK per-pixel contribution still reaches `thr`, instead
    # of the fixed 2*CUTOFF cutoff box; splats with opacity <= thr are
    # culled outright.  The reference's hardware quads always cover the full
    # cutoff AABB and rely on fragment discard (gaussian.wgsl:47-67), so
    # every instance this drops contributes < thr to any pixel it touches —
    # below one 8-bit display quantization step at the default 1/255.  The
    # rasterizer's blend math is unchanged for emitted tiles.  0 disables
    # (reference-exact coverage).
    # Default 1/255 since round 4.  NOTE the reference discards only on the
    # spatial test (a > 2*CUTOFF, gaussian.wgsl:61-64) — it has no alpha
    # discard — so thr=1/255 is an approximation: it drops exactly the
    # contributions below one 8-bit display quantization step (the INRIA
    # CUDA rasterizer's classic `alpha < 1/255 -> skip` convention).  Gated
    # by the bench-scale PSNR-vs-oracle artifact (PSNR_r04.json >= 60 dB).
    # Measured (TPU v5e, bonsai bench with the trained-scene
    # bimodal opacity mixture, scripts/sweep_alpha.py 2026-08-20):
    #   thr=0      : 17.32 ms  n_inst=1,785,438
    #   thr=1/512  : 17.10 ms  n_inst=1,735,530
    #   thr=1/255  : 16.87 ms  n_inst=1,699,923   <- default
    #   thr=1/128  : 16.00 ms  n_inst=1,645,835   (beyond reference discard)
    # (The round-3 "no instance cut" verdict was an artifact of the legacy
    # synthetic opacity draw having no low-alpha tail; see tests/synth.py.)
    # Full-scale PSNR vs the exact oracle (PSNR_r04.json, post overflow +
    # record fixes): thr=1/255 63.25 dB, thr=0 60.24, 1/512 60.09,
    # 1/128 59.89.  thr=0 scoring BELOW the default is not a coverage
    # artifact (num_clamped = num_dropped = 0): the extra fringe tiles it
    # renders lie on sub-pixel-width needles where the u16 center
    # quantization (~0.012 px half-step vs ~0.4 px minor sigma) dominates
    # the per-pixel profile error, so rendering more of those fringes adds
    # more (bounded) quantization error than it removes cull divergence.
    alpha_threshold: float = 1.0 / 255.0

    # Compressed-residency cull-before-gather: when > 0, the compressed
    # path frustum-culls on the resident xyz FIRST (exactly the preprocess
    # center test), compacts survivors to a static
    # ceil(compressed_cull_factor * N) capacity (Pallas), and runs the
    # dominant codebook gathers (~5 ms/M rows) only over that prefix —
    # renderer.decompress_cloud_culled.  Size it so the worst camera's
    # visible fraction fits; splats beyond capacity are DROPPED (surfaced
    # as num_culled_dropped in the diagnostics).  0 disables (gathers run
    # at full N; reference-exact coverage for any camera).  The reference
    # analogue: preprocess_compressed.wgsl:229-242 culls before touching
    # the codebooks.
    #
    # Sizing guidance, MEASURED at 10M splats (TENM_r05.json, TPU): at an
    # orbit camera seeing 78% of the cloud the cull is a wash (2.83 vs
    # 2.86 FPS — the predicate + 10M-row compact costs what the 10% cut
    # saves), but at a walkthrough camera inside the cloud (12% visible,
    # factor = 1.15 * visible_fraction = 0.14) it is a 4.6x win: 3.38 ->
    # 15.49 FPS.  Recipe: measure the worst-case visible fraction over
    # the camera path (one frustum_visible readback per candidate view),
    # set factor = 1.15 * max_fraction, and keep 0 for orbit/turntable
    # viewing where most of the cloud stays in frustum.
    compressed_cull_factor: float = 0.0

    # Early-termination threshold on transmittance.  The reference blends
    # every fragment back-to-front with no early out
    # (/root/reference/src/shaders/gaussian.wgsl:59-67); front-to-back with
    # T < eps cutoff is mathematically identical up to eps (the dropped
    # tail contributes < eps per channel).  0.0 disables.
    # Default 4e-3 since round 4 (~ one 8-bit display quantization step,
    # the same budget that justifies alpha_threshold=1/255): TPU-measured
    # at the trained-opacity bonsai bench 52.03 -> 54.30 FPS vs eps=1e-3,
    # full-scale PSNR 63.25 -> 63.14 dB (PSNR_r04.json).  History: 1e-4 ->
    # 50.7 FPS, 1e-3 -> 54.6 (round-3 legacy scene).  1e-2 measured 62.56
    # dB but crosses the display-step error argument, so it stays opt-in.
    transmittance_eps: float = 4e-3

    # Skip blending for 8-splat groups with no contribution (branchy but
    # saves work in sparse tiles).
    group_skip: bool = True
    # Horizontal sub-tile bands for the Pallas rasterizer: the tile's pixel
    # rows are split into y_bands bands with independent composite carries,
    # and each (segment, band) pair is skipped when no splat in the segment
    # can reach the band's y range (from the per-group ellipse y-extent).
    # tile_h % y_bands == 0 and (tile_w*tile_h/y_bands) % 128 == 0 required;
    # 1 disables banding.  Default 1: measured on v5e at bonsai scale the
    # banded kernel LOSES (26.4 -> 44.4 ms/frame at 4 bands, 32x16 tiles) —
    # per-group setup (column extracts) is re-paid per live band and the
    # per-(segment, band) lax.cond liveness reductions outweigh the skipped
    # blend work.  Kept (bit-exact, tested) for future large-tile configs.
    y_bands: int = 1
    # k-rows per skip-branch segment (seg_k*16 groups share one liveness
    # branch) and the number of groups whose blend instruction streams are
    # interleaved for ILP — both measured-tuned (see rasterize_pallas.py).
    seg_k: int = 2
    group_batch: int = 4
    # Cross-group transmittance prefix tree for the scan composite: the
    # per-group serial (1, P) transmittance multiply is a latency chain
    # (~224k dependent ops/frame at bonsai scale); the tree prefixes each
    # batch's group totals independently of the carry so the cross-batch
    # chain is one multiply per group_batch groups, at ~log2(group_batch)
    # extra (1, P) multiplies per batch.  Bit-inexact vs the serial carry
    # only through f32 reassociation of the same products.
    # MEASURED LOSER (TPU v5e, bonsai bench, sweep_raster --btree): a wash
    # at the shipped config (9.05 -> 9.02 ms raster, seg=2 gb=4) and WORSE
    # at wider batches (gb=8: 9.07 -> 10.46 ms; gb=16: 10.40) — the serial
    # chain is NOT the rasterizer's wall (the VPU hides it under the group
    # math); the tree's extra (1, P) multiplies only add work.  Kept
    # selectable for future hardware where the latency/throughput balance
    # differs.
    scan_batch_tree: bool = False
    # Inner-loop math variants of the Pallas rasterizer (bit-inexact vs each
    # other only at the 2*CUTOFF discard boundary and f32 rounding; all
    # oracle-tested):
    # - composite "tree": pairwise log-step over-composite of the 8-splat
    #   group across r/g/b/T (4 streams x 3 roll levels).
    #   "scan": one masked Hillis-Steele prefix-product of (1-alpha) along
    #   the sublanes, then weights w = alpha*T_excl accumulate into (8, P)
    #   per-band channel accumulators reduced once per tile — ~40% fewer
    #   vector ops per group.
    # - qform "direct": a = ha*dx^2 + hb*dx*dy + hc*dy^2 per pixel.
    #   "monomial": a as a per-splat 6-coefficient dot with per-tile pixel
    #   monomials [X^2, XY, Y^2, X, Y, 1] in TILE-LOCAL coordinates (bounds
    #   the f32 cancellation error; see rasterize_pallas.py), with log(op)
    #   folded into the constant term so the alpha multiply and the op>0
    #   test disappear.
    # - composite "mxu": restructured slab kernel — the monomial quadratic
    #   form, the (log-space) transmittance prefix and the color
    #   accumulation all run as MXU contractions over 128-splat slabs
    #   (rasterize_pallas._make_kernel_mxu); qform is ignored.
    # - composite "hybrid": the slab kernel rebalanced — exact-f32 VPU
    #   quadratic form (the MXU pads its k=6 contraction to a full tile
    #   volume anyway), transmittance prefix + colors on the MXU as 2-pass
    #   exact-split bf16 matmuls (~2^-17 residual; see _make_kernel_mxu).
    #   qform/mxu_precision are ignored.
    # Defaults: scan/monomial, TPU-measured 2026-08-18 — 9.11 vs 12.70 ms
    # (tree/direct) at 32x32 bonsai scale; the win holds at every tile
    # shape swept (scripts/sweep_raster.py).
    composite: str = "scan"
    qform: str = "monomial"
    # f32-emulation pass count for the mxu composite's matmuls ("default"
    # 1-pass bf16 / "high" 3-pass / "highest" 6-pass ~= f32).  The quadratic
    # form needs >= "high" (terms up to ~1e4 vs ~1e-4 absolute error budget).
    mxu_precision: str = "highest"

    # Compact invalid instances out before the sort (Pallas kernel): the sort
    # then runs over ~the true instance count instead of N * tile_slots,
    # which is what makes large slot budgets affordable.  The compacted
    # capacity is ceil(instance_capacity_factor * N); overflow instances are
    # dropped and reported in the render diagnostics.
    compact: bool = True
    instance_capacity_factor: float = 2.0

    # Sort backend: "xla" (lax.sort, 5 u32 operands) or "u64" ((key<<32|w0,
    # w1<<32|w2, w3) packed — 3 operands; see ops/sort.py).  TPU-measured
    # 2026-08-18 at M=1.79M: 5xu32 unstable 4.46 ms, u64-packed 4.82 ms —
    # the emulated 64-bit key compare costs more than the two operands it
    # saves, so "xla" stays the default (a TRUE 3xu32 sort would be 2.86 ms,
    # but the 128-bit record cannot shrink to 2 words losslessly).  Other
    # measured alternatives lost outright: scatter-based radix is ~50 ms/M
    # on TPU; batched row sorts reach 0.76-0.9 ms/M at ~8-16k-element rows
    # (~128 key-range regions at bonsai scale) but the only TPU partition
    # primitive is per-region mask+compact, linear in region count (~1.4 ms
    # per 8-way pass), so the partition eats the sort saving — full numbers
    # in scripts/bench_sort.py:extra.
    sort_backend: str = "xla"

    # Rasterizer backend: "pallas" or "xla" (reference/debug fallback).
    raster_backend: str = "pallas"

    # Static cap on per-tile splat count used ONLY by the XLA fallback
    # rasterizer (the Pallas kernel has no cap; it loops the true range).
    xla_max_per_tile: int = 2048

    @classmethod
    def from_env(cls, **overrides) -> "RasterConfig":
        """RasterConfig with WS_* environment overrides applied on top of
        ``overrides`` — the measurement scripts' shared tuning hook
        (scripts/profile_stages.py, bench.py):

          WS_COMPOSITE / WS_QFORM / WS_SORT / WS_MXU_PREC   (strings)
          WS_TILE=WxH  WS_SLOTS / WS_OVERFLOW / WS_OSLOTS   (ints)
          WS_ALPHA / WS_EPS                                 (floats)
        """
        import os

        env = {
            "composite": os.environ.get("WS_COMPOSITE"),
            "qform": os.environ.get("WS_QFORM"),
            "sort_backend": os.environ.get("WS_SORT"),
            "mxu_precision": os.environ.get("WS_MXU_PREC"),
        }
        overrides.update({k: v for k, v in env.items() if v})
        if os.environ.get("WS_TILE"):
            tw, th = os.environ["WS_TILE"].split("x")
            overrides["tile_w"], overrides["tile_h"] = int(tw), int(th)
        for var, field, cast in (
            ("WS_SLOTS", "tile_slots", int),
            ("WS_OVERFLOW", "overflow_capacity", int),
            ("WS_OSLOTS", "overflow_slots", int),
            ("WS_ALPHA", "alpha_threshold", float),
            ("WS_EPS", "transmittance_eps", float),
            ("WS_SEG_K", "seg_k", int),
            ("WS_GROUP_BATCH", "group_batch", int),
            ("WS_BTREE", "scan_batch_tree", lambda v: bool(int(v))),
            ("WS_CULL", "compressed_cull_factor", float),
        ):
            if os.environ.get(var):
                overrides[field] = cast(os.environ[var])
        return cls(**overrides)

    @classmethod
    def for_backend(cls, **overrides) -> "RasterConfig":
        """Defaults adjusted to the active JAX backend: off-TPU, the Pallas
        kernels only run in the (slow) interpreter, so the XLA fallbacks are
        the right choice for interactive use."""
        import jax

        if jax.default_backend() != "tpu":
            overrides.setdefault("raster_backend", "xla")
            overrides.setdefault("compact", False)
            overrides.setdefault("xla_max_per_tile", 512)
        return cls(**overrides)

    @classmethod
    def for_viewport(cls, width: int, height: int, **overrides) -> "RasterConfig":
        """for_backend + a tile shape whose grid fits the fused frontend.

        The fused frontend packs tile coordinates in 7 bits per axis
        (<=127 tiles); at e.g. the measure binary's 2048x2048 the default
        32x16 grid is 128 rows and the frame silently falls back to the
        slower slot-stream path.  Doubling the tile edge (up to 64 px)
        keeps the fused path for viewports up to 8128 px per axis.
        Explicit tile_w/tile_h overrides are respected untouched."""
        cfg = cls.for_backend(**overrides)
        if "tile_w" in overrides or "tile_h" in overrides:
            return cfg
        tw, th = cfg.tile_w, cfg.tile_h
        while -(-height // th) > 127 and th < 64:
            th *= 2
        while -(-width // tw) > 127 and tw < 64:
            tw *= 2
        if (tw, th) != (cfg.tile_w, cfg.tile_h):
            cfg = dataclasses.replace(cfg, tile_w=tw, tile_h=th)
        return cfg

    def tiles_for(self, width: int, height: int) -> Tuple[int, int]:
        return (-(-width // self.tile_w), -(-height // self.tile_h))

    def key_bits(self, width: int, height: int) -> Tuple[int, int]:
        """(tile_bits, depth_bits) of the packed 32-bit sort key.

        Key layout: ``tile_id << depth_bits | depth_q``.  The all-ones key is
        reserved as the invalid sentinel (mirrors the radix sort's padding
        convention, /root/reference/src/shaders/radix_sort.wgsl:79).
        """
        tx, ty = self.tiles_for(width, height)
        num_tiles = tx * ty
        tile_bits = max(1, int(np.ceil(np.log2(num_tiles + 1))))
        return tile_bits, 32 - tile_bits


@dataclasses.dataclass(frozen=True)
class SplattingArgs:
    """Per-frame render settings (traced; changing values does NOT recompile).

    Mirrors SplattingArgs (/root/reference/src/renderer.rs:585-599).  Optional
    fields mean "defer to the point cloud's per-file default", resolved in
    :func:`resolve_settings` exactly like ``SplattingArgsUniform::
    from_args_and_pc`` (/root/reference/src/renderer.rs:620-652).
    """

    gaussian_scaling: float = 1.0
    max_sh_deg: int = 3
    mip_splatting: Optional[bool] = None
    kernel_size: Optional[float] = None
    clipping_box_min: Optional[Tuple[float, float, float]] = None
    clipping_box_max: Optional[Tuple[float, float, float]] = None
    # Reference viewer accumulates walltime for the grow-in animation
    # (/root/reference/src/lib.rs:353-355); the offline renderer uses 100 s =
    # fully grown (/root/reference/src/bin/render.rs:100).
    walltime: float = 100.0
    scene_center: Optional[Tuple[float, float, float]] = None
    scene_extend: Optional[float] = None
    background_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class ResolvedSettings:
    """SplattingArgs with per-cloud defaults substituted (device-ready)."""

    gaussian_scaling: float
    max_sh_deg: int
    mip_splatting: bool
    kernel_size: float
    clipping_box_min: Tuple[float, float, float]
    clipping_box_max: Tuple[float, float, float]
    walltime: float
    scene_center: Tuple[float, float, float]
    scene_extend: float
    background_color: Tuple[float, float, float]


def resolve_settings(args: SplattingArgs, pc) -> ResolvedSettings:
    """Resolve Optional args against point-cloud metadata.

    Mirrors SplattingArgsUniform::from_args_and_pc
    (/root/reference/src/renderer.rs:620-652): mip/kernel fall back to file
    metadata then global defaults, clipping box falls back to the cloud bbox,
    scene_extend = max(requested, bbox.radius()).
    """
    bbox_min, bbox_max = pc.aabb
    radius = float(np.linalg.norm((np.asarray(bbox_max) - np.asarray(bbox_min)) / 2.0))
    mip = args.mip_splatting
    if mip is None:
        mip = bool(pc.mip_splatting) if pc.mip_splatting is not None else False
    kernel = args.kernel_size
    if kernel is None:
        kernel = pc.kernel_size if pc.kernel_size is not None else DEFAULT_KERNEL_SIZE
    extend = args.scene_extend if args.scene_extend is not None else radius
    extend = max(extend, radius)
    center = args.scene_center if args.scene_center is not None else tuple(pc.center)
    cb_min = args.clipping_box_min if args.clipping_box_min is not None else tuple(bbox_min)
    cb_max = args.clipping_box_max if args.clipping_box_max is not None else tuple(bbox_max)
    return ResolvedSettings(
        gaussian_scaling=float(args.gaussian_scaling),
        max_sh_deg=int(args.max_sh_deg),
        mip_splatting=bool(mip),
        kernel_size=float(kernel),
        clipping_box_min=tuple(float(x) for x in cb_min),
        clipping_box_max=tuple(float(x) for x in cb_max),
        walltime=float(args.walltime),
        scene_center=tuple(float(x) for x in center),
        scene_extend=float(extend),
        background_color=tuple(float(x) for x in args.background_color),
    )
