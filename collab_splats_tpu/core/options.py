"""Static rasterization options shared by the golden and tiled renderers."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Static (hashable) rasterizer configuration.

    Defaults mirror the reference's rasterization call
    (/root/reference/collab_splats/models/rade_gs_model.py:439-465: near 0.01,
    far 1e10, eps2d 0.3, rasterize_mode classic|antialiased).
    """

    tile_size: int = 16
    eps2d: float = 0.3
    near_plane: float = 0.01
    far_plane: float = 1e10
    rasterize_mode: str = "classic"  # "classic" | "antialiased"
    normalize_depth: bool = True
    radius_clip: float = 0.0

    # Tiled-rasterizer capacities (static shapes under jit).  ``None`` lets
    # the renderer pick heuristics from N and the tile count.
    max_intersections: int | None = None   # global (gaussian, tile) pair budget
    tile_capacity: int | None = None       # per-tile front-to-back splat budget

    # Exact ellipse-vs-tile-rect cull at binning time: the per-axis bbox
    # (radius_xy) conservatively assigns a diagonal splat to corner tiles
    # its alpha >= 1/255 ellipse never reaches; the cull drops those
    # entries before the intersection sort.  Output-preserving by
    # construction (splat_alpha zeroes them anyway) — it only frees
    # tile-window slots (measured: -10% intersections, window spill
    # halved on the 1M/720p bench scene) at the cost of ~30 fused flops
    # per candidate entry.
    ellipse_cull: bool = True

    # Depth ordering inside tiles: exact (global argsort ranks) or
    # quantized log-depth keys (skips the N-sort; ties between splats whose
    # depths agree to ~0.1% may order arbitrarily — visually and
    # training-wise indistinguishable, cheaper to bin).
    exact_binning: bool = True

    # Compositing backend: "xla" (dense windows, pure autodiff) or "pallas"
    # (fused per-tile kernel with custom VJP + transmittance early exit).
    backend: str = "xla"
    stop_threshold: float = 1e-4           # pallas early-exit (0 disables)
    pallas_interpret: bool = False         # interpreter mode (CPU tests)

    # Backward-pass memory policy for the XLA compositor's chunk loop:
    # True remats each chunk (recomputes alphas/depths in the backward,
    # minimal memory); False pins the named analytic-VJP residuals
    # (alphas/tpix/values/idx/t_excl/t_total, ~5.4 GB at 1M/720p) across
    # the loop via a save_only_these_names checkpoint policy — the backward
    # then skips the exp pass, transmittance scan, and median selection
    # replay.  (A fully un-checkpointed loop keeps every [T,P,K]
    # intermediate live — measured 24.2 GB, an HBM OOM on v5e.)
    remat_compositing: bool = True

    # Fused compositing VJP: ONE analytic custom VJP from the gathered
    # per-splat matrix to the composited maps (core/compositing.
    # fused_compositor).  Removes the [T,P,K] alphas/tpix cotangent
    # tensors the narrow composite_chunk boundary forces into HBM and
    # lets every elementwise chain fuse into its consuming reduction;
    # the only [T,P,K] materializations left are the transmittance-scan
    # and value-einsum matmul operands.  False falls back to the
    # composite_chunk path (autodiff through splat_alpha), kept for
    # differential testing; remat_compositing only applies there.
    fused_vjp: bool = True

    # Run the fused forward as the batched Pallas kernel
    # (ops/pallas/batched.py): the alpha -> transmittance -> weight chain
    # stays in VMEM and only the value-einsum weight matrix is written to
    # HBM.  Requires fused_vjp; falls back to the XLA fused path off-TPU
    # unless pallas_interpret is set.  The backward is the shared chunked
    # moment backward either way.
    pallas_batched: bool = False

    # With pallas_batched: run the backward as the batched Pallas kernel
    # too (ops/pallas/batched_bwd.py — back-to-front suffix walk over the
    # forward-banked per-block transmittance prefixes, VMEM-resident,
    # writes only per-splat moment reductions).  False keeps the chunked
    # XLA moment backward for A/B.
    pallas_batched_bwd: bool = True

    # Remat the projection -> packed-per-gaussian chain: AD otherwise saves
    # ~16 [N,1]-shaped projection intermediates as residuals, which XLA
    # stages through scoped memory in 128x-padded T(1,128) layouts —
    # profiled at ~150 ms/step at 1M gaussians vs ~5 ms to recompute the
    # projection math inside the backward.
    remat_projection: bool = True

    def __post_init__(self):
        if self.rasterize_mode not in ("classic", "antialiased"):
            raise ValueError(f"Unknown rasterize_mode: {self.rasterize_mode}")
        if self.backend not in ("xla", "pallas"):
            raise ValueError(f"Unknown backend: {self.backend}")
