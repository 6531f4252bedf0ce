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

    def __post_init__(self):
        if self.rasterize_mode not in ("classic", "antialiased"):
            raise ValueError(f"Unknown rasterize_mode: {self.rasterize_mode}")
        if self.backend not in ("xla", "pallas"):
            raise ValueError(f"Unknown backend: {self.backend}")
