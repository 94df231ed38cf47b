"""ExcludeZeroSHQuantizer: reserve codebook id 0 / a zero centroid for
all-zero SH rows, so SH-culled coefficients survive quantization exactly
(mirrors /root/reference/reduced_3dgs/quantization/exclude_zeros.py)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .quantizer import VectorQuantizer


class ExcludeZeroSHQuantizer(VectorQuantizer):

    def __init__(self, *args, treat_as_zero: float = 1e-8, **kwargs):
        super().__init__(*args, **kwargs)
        self.treat_as_zero = treat_as_zero

    def zeros_mask(self, values) -> jnp.ndarray:
        return jnp.all(jnp.abs(values) < self.treat_as_zero, axis=-1)

    def has_zero(self, values) -> bool:
        return bool(jnp.any(self.zeros_mask(values)))

    def generate_codebook_exclude_zero(self, values, num_clusters=256,
                                       init_codebook=None):
        """K-Means on the non-zero rows only, with the zero centroid pinned at
        id 0 (reference exclude_zeros.py:14-28). Implemented with weights
        (zero rows get weight 0) to keep shapes static."""
        values = jnp.asarray(values)
        zmask = self.zeros_mask(values)
        if bool(jnp.all(zmask)):
            return (jnp.zeros((1, values.shape[1]), values.dtype),
                    jnp.zeros((values.shape[0],), jnp.int32))
        if init_codebook is not None:
            init_codebook = jnp.asarray(init_codebook)
            if float(jnp.max(jnp.abs(init_codebook))) < self.treat_as_zero:
                init_codebook = None
            elif init_codebook.shape[0] > num_clusters - 1:
                init_codebook = init_codebook[-(num_clusters - 1):]
        from ..ops.kmeans import kmeans, assign
        weights = (~zmask).astype(values.dtype)
        nz_centers, _ = kmeans(values, int(num_clusters) - 1,
                               weights=weights,
                               init_centers=init_codebook,
                               max_iter=self.max_iter, tol=self.tol,
                               seed=self.seed)
        nz_ids = assign(values, nz_centers)
        ids = jnp.where(zmask, 0, nz_ids + 1).astype(jnp.int32)
        centers = jnp.concatenate(
            [jnp.zeros((1, values.shape[1]), values.dtype), nz_centers], 0)
        return centers, ids

    def produce_clusters_degree_features_rest(self, model, sh_degree,
                                              init_codebook=None):
        vals = self._rest_flat(model, sh_degree)
        if self.has_zero(jnp.asarray(vals)):
            cb, ids = self.generate_codebook_exclude_zero(
                vals, self.num_clusters_features_rest[sh_degree], init_codebook)
        else:
            cb, ids = self.generate_codebook(
                vals, self.num_clusters_features_rest[sh_degree], init_codebook)
        return cb, ids.reshape(-1, 3)
