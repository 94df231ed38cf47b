"""Variable-per-Gaussian-SH-degree model.

TPU-native equivalent of the reference VariableSHGaussianModel
(/root/reference/reduced_3dgs/shculling/gaussian_model.py): an int `_degrees`
array [N] selects how many SH bands each Gaussian uses. The reference zeroes
masked coefficient rows AND their gradients in-place
(gaussian_model.py:17-29); here the same semantics fall out functionally:
`masked_features` multiplies the rest coefficients by the degree mask, so
masked rows contribute nothing to the render and receive zero gradient.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ..models.gaussian_model import CameraTrainableGaussianModel, GaussianModel
from ..ops import sh as sh_ops


class VariableSHGaussianModel(GaussianModel):

    def __init__(self, sh_degree: int = 3, **kwargs):
        super().__init__(sh_degree, **kwargs)
        self._degrees = jnp.zeros((0,), jnp.int32)

    # --- aux plumbing -------------------------------------------------------
    def aux_state(self) -> Dict[str, jnp.ndarray]:
        return {"degrees": self._degrees}

    def aux_set(self, aux: Dict[str, jnp.ndarray]):
        self._degrees = aux["degrees"]
        return self

    def aux_for_new_points(self, m: int) -> Dict[str, jnp.ndarray]:
        # New densified points start at max degree (reference
        # gaussian_model.py:60).
        return {"degrees": jnp.full((m,), self.max_sh_degree, jnp.int32)}

    # --- degree-masked features --------------------------------------------
    def masked_features(self, params: Dict[str, jnp.ndarray],
                        aux: Optional[Dict[str, jnp.ndarray]] = None) -> jnp.ndarray:
        degrees = (aux or {}).get("degrees", self._degrees)
        mask = sh_ops.degree_coeff_mask(degrees, self.max_sh_degree)
        rest = params["features_rest"] * mask[..., None]
        return jnp.concatenate([params["features_dc"], rest], axis=1)

    @property
    def get_features(self):
        return self.masked_features(self.parameters(), self.aux_state())

    # --- degree maintenance --------------------------------------------------
    def init_degrees(self):
        self._degrees = jnp.full((self._xyz.shape[0],), self.max_sh_degree,
                                 jnp.int32)
        return self

    def create_from_pcd(self, *args, **kwargs):
        super().create_from_pcd(*args, **kwargs)
        return self.init_degrees()

    def load_ply(self, *args, **kwargs):
        super().load_ply(*args, **kwargs)
        return self.init_degrees()

    def update_points_add(self, *args, **kwargs):
        super().update_points_add(*args, **kwargs)
        extra = self._xyz.shape[0] - self._degrees.shape[0]
        if extra > 0:
            self._degrees = jnp.concatenate(
                [self._degrees,
                 jnp.full((extra,), self.max_sh_degree, jnp.int32)])
        return self

    def update_points_remove(self, removed_mask, *args, **kwargs):
        super().update_points_remove(removed_mask, *args, **kwargs)
        self._degrees = self._degrees[~removed_mask]
        return self


class CameraTrainableVariableSHGaussianModel(VariableSHGaussianModel,
                                             CameraTrainableGaussianModel):
    pass


# Render-backend registry parity (reference gaussian_model.py:83-101 exposes
# gsplat / gsplat-2dgs mixins). Our TPU tiled renderer is behaviorally a
# 3DGS renderer, so the "gsplat" aliases map to the same implementation; the
# 2DGS (surfel) variant routes to the dedicated flat-splat renderer
# (ops/rasterize/twodgs.py).
VariableSHGsplatGaussianModel = VariableSHGaussianModel
CameraTrainableVariableSHGsplatGaussianModel = CameraTrainableVariableSHGaussianModel


class VariableSHGsplat2DGSGaussianModel(VariableSHGaussianModel):
    """Variable-SH model rendered as 2D (surfel) Gaussians.

    TPU equivalent of the reference's `Gsplat2DGSGaussianModel` mixin
    (/root/reference/reduced_3dgs/shculling/gaussian_model.py:91-96): same
    parameters and reduction features, flat-disk splatting forward model.
    The third scale component is ignored by the renderer."""

    def render(self, params, camera, aux=None, alive=None,
               mean2d_offset_ndc=None, with_stats: bool = False,
               key_buffer_size=None):
        from ..ops.rasterize.twodgs import render_tiled_2dgs
        settings = self.render_settings(camera)
        args = self.render_array_args(params, aux)
        return render_tiled_2dgs(
            *args, settings, alive=alive,
            mean2d_offset_ndc=mean2d_offset_ndc, with_stats=with_stats,
            key_buffer_size=key_buffer_size or self._key_buffer_size)

    def render_band(self, params, settings, *, aux=None, alive=None,
                    tile_row_offset, tile_rows: int, key_buffer_size: int,
                    mean2d_offset_ndc=None, with_stats: bool = False,
                    use_pallas=None):
        del use_pallas  # 2DGS band path is the XLA segmented-scan renderer
        from ..ops.rasterize.twodgs import render_tiled_2dgs
        args = self.render_array_args(params, aux)
        return render_tiled_2dgs(
            *args, settings, alive=alive,
            mean2d_offset_ndc=mean2d_offset_ndc, with_stats=with_stats,
            key_buffer_size=key_buffer_size,
            tile_row_offset=tile_row_offset, tile_rows=tile_rows)


class CameraTrainableVariableSHGsplat2DGSGaussianModel(
        VariableSHGsplat2DGSGaussianModel, CameraTrainableGaussianModel):
    pass
