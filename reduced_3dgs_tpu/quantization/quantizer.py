"""Codebook (K-Means) vector quantization of Gaussian attributes.

TPU-native equivalent of /root/reference/reduced_3dgs/quantization/quantizer.py:
per-attribute codebooks — features_dc; features_rest split per SH band
(3/5/7 coefficient groups quantized per channel row); rotation real/imaginary
parts; opacity (logit space); scaling clustered in activated space with the
codebook STORED in log space (quantizer.py:132-138) — plus the quantized-PLY
format (field names, uint code widths from cluster counts, codebook
elements; README.md:181-206) byte-compatible with the reference loader.

K-Means runs on-device (ops/kmeans.py) instead of the reference's
cuML/sklearn host round trip; warm starting matches produce_clusters
(quantizer.py:140-162).
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models import ply as plyio
from ..models.gaussian_model import GaussianModel
from ..ops.kmeans import assign as kmeans_assign
from ..ops.kmeans import kmeans
from .abc import AbstractQuantizer


def compute_uint_length(n: int) -> int:
    count = 0
    while n >> 1:
        count += 1
        n >>= 1
    return count


def compute_uint_dtype(n: int) -> str:
    """Reference quantizer.py:29-42: floor(log2(n)) bits -> byte width."""
    bits = compute_uint_length(n)
    nbytes = bits // 8 + (1 if bits % 8 else 0)
    return f"u{max(nbytes, 1)}"


def _live(model: GaussianModel, arr) -> jnp.ndarray:
    """Live-prefix slice ON DEVICE: np.asarray here pulled every attribute
    through the remote-TPU tunnel each quantize event (~100 MB round trip,
    measured 20 s/event warm on the axon v5e link); the PLY writers convert
    to numpy themselves where they actually need host bytes."""
    return jnp.asarray(arr)[: model.num_points]


class VectorQuantizer(AbstractQuantizer):

    def __init__(
            self,
            num_clusters: int = 256,
            num_clusters_rotation_re: Optional[int] = None,
            num_clusters_rotation_im: Optional[int] = None,
            num_clusters_opacity: Optional[int] = None,
            num_clusters_scaling: Optional[int] = None,
            num_clusters_features_dc: Optional[int] = None,
            num_clusters_features_rest=(),
            max_sh_degree: int = 3,
            force_code_dtype: Optional[str] = None,
            force_codebook_dtype: str = "f4",
            tol: float = 1e-4, max_iter: int = 300,
            warm_max_iter: int = 15, seed: int = 0):
        self.num_clusters_rotation_re = num_clusters_rotation_re or num_clusters
        self.num_clusters_rotation_im = num_clusters_rotation_im or num_clusters
        self.num_clusters_opacity = num_clusters_opacity or num_clusters
        self.num_clusters_scaling = num_clusters_scaling or num_clusters
        self.num_clusters_features_dc = num_clusters_features_dc or num_clusters
        nfr = list(num_clusters_features_rest or [])
        self.num_clusters_features_rest = [
            nfr[i] if len(nfr) > i else num_clusters
            for i in range(max_sh_degree)]
        self.force_code_dtype = force_code_dtype
        self.force_codebook_dtype = force_codebook_dtype
        self.tol = tol
        self.max_iter = max_iter
        # Warm in-training updates (every 1000 steps on the flagship
        # schedule) start from the previous codebook, so a handful of Lloyd
        # rounds suffices; tol/max_iter defaults match sklearn KMeans, the
        # engine behind the reference's quantizer (quantizer.py:7-15).
        self.warm_max_iter = warm_max_iter
        self.seed = seed
        self._codebook_dict: Dict[str, jnp.ndarray] = {}

    # --- core K-Means plumbing (reference :73-91) ---------------------------
    def generate_codebook(self, values, num_clusters, init_codebook=None):
        warm = (init_codebook is not None
                and init_codebook.shape[0] >= int(num_clusters))
        centers, ids = kmeans(jnp.asarray(values), int(num_clusters),
                              init_centers=None if init_codebook is None
                              else jnp.asarray(init_codebook),
                              max_iter=self.warm_max_iter if warm
                              else self.max_iter, tol=self.tol,
                              seed=self.seed)
        return centers, ids

    def one_nearst(self, points, codebook):
        if codebook.shape[0] <= 1:
            return jnp.zeros((points.shape[0],), jnp.int32)
        return kmeans_assign(jnp.asarray(points), jnp.asarray(codebook))

    # --- per-attribute extraction (reference :93-138) -----------------------
    @staticmethod
    def _rest_flat(model: GaussianModel, sh_degree: int) -> jnp.ndarray:
        """[N*3, band_coeffs] channel-major rows of one SH band."""
        fr = _live(model, model._features_rest)                   # [N, M, 3]
        flat = jnp.transpose(fr, (0, 2, 1)).reshape(-1, fr.shape[1])
        lo, hi = (sh_degree + 1) ** 2 - 1, (sh_degree + 2) ** 2 - 1
        return flat[:, lo:hi]

    def produce_clusters_features_dc(self, model, init_codebook=None):
        vals = _live(model, model._features_dc)[:, 0, :]
        cb, ids = self.generate_codebook(vals, self.num_clusters_features_dc,
                                         init_codebook)
        return cb, ids[:, None]

    def find_nearest_cluster_id_features_dc(self, model, codebook):
        return self.one_nearst(_live(model, model._features_dc)[:, 0, :],
                               codebook)[:, None]

    def produce_clusters_degree_features_rest(self, model, sh_degree,
                                              init_codebook=None):
        vals = self._rest_flat(model, sh_degree)
        cb, ids = self.generate_codebook(
            vals, self.num_clusters_features_rest[sh_degree], init_codebook)
        return cb, ids.reshape(-1, 3)

    def find_nearest_cluster_id_degree_features_rest(self, model, sh_degree,
                                                     codebook):
        vals = self._rest_flat(model, sh_degree)
        return self.one_nearst(vals, codebook).reshape(-1, 3)

    def produce_clusters_rotation_re(self, model, init_codebook=None):
        vals = _live(model, model.get_rotation)[:, 0:1]
        return self.generate_codebook(vals, self.num_clusters_rotation_re,
                                      init_codebook)

    def find_nearest_cluster_id_rotation_re(self, model, codebook):
        return self.one_nearst(_live(model, model.get_rotation)[:, 0:1], codebook)

    def produce_clusters_rotation_im(self, model, init_codebook=None):
        vals = _live(model, model.get_rotation)[:, 1:]
        return self.generate_codebook(vals, self.num_clusters_rotation_im,
                                      init_codebook)

    def find_nearest_cluster_id_rotation_im(self, model, codebook):
        return self.one_nearst(_live(model, model.get_rotation)[:, 1:], codebook)

    def produce_clusters_opacity(self, model, init_codebook=None):
        vals = _live(model, model._opacity)
        return self.generate_codebook(vals, self.num_clusters_opacity,
                                      init_codebook)

    def find_nearest_cluster_id_opacity(self, model, codebook):
        return self.one_nearst(_live(model, model._opacity), codebook)

    def produce_clusters_scaling(self, model, init_codebook=None):
        # clustered in activated space; codebook stored in log space — so a
        # warm-start codebook (stored log-space) must be ACTIVATED before
        # seeding the activated-space K-Means, or the warm start lands far
        # from the data and converges no faster than cold
        vals = _live(model, model.get_scaling)
        if init_codebook is not None:
            init_codebook = model.scaling_activation(
                jnp.asarray(init_codebook))
        centers, ids = self.generate_codebook(vals, self.num_clusters_scaling,
                                              init_codebook)
        return model.scaling_inverse_activation(centers), ids

    def find_nearest_cluster_id_scaling(self, model, codebook):
        return self.one_nearst(_live(model, model.get_scaling),
                               model.scaling_activation(jnp.asarray(codebook)))

    # --- full produce / assign (reference :140-175) -------------------------
    def produce_clusters(self, model: GaussianModel, init_codebook_dict=None):
        init = {"features_dc": None, "rotation_re": None, "rotation_im": None,
                "opacity": None, "scaling": None,
                **{f"features_rest_{d}": None
                   for d in range(model.max_sh_degree)},
                **(init_codebook_dict or {})}
        cb, ids = {}, {}
        cb["features_dc"], ids["features_dc"] = self.produce_clusters_features_dc(
            model, init["features_dc"])
        for d in range(model.max_sh_degree):
            cb[f"features_rest_{d}"], ids[f"features_rest_{d}"] = (
                self.produce_clusters_degree_features_rest(
                    model, d, init[f"features_rest_{d}"]))
        cb["rotation_re"], ids["rotation_re"] = self.produce_clusters_rotation_re(
            model, init["rotation_re"])
        cb["rotation_im"], ids["rotation_im"] = self.produce_clusters_rotation_im(
            model, init["rotation_im"])
        cb["opacity"], ids["opacity"] = self.produce_clusters_opacity(
            model, init["opacity"])
        cb["scaling"], ids["scaling"] = self.produce_clusters_scaling(
            model, init["scaling"])
        return cb, ids

    def find_nearest_cluster_id(self, model: GaussianModel, codebook_dict):
        ids = {}
        ids["features_dc"] = self.find_nearest_cluster_id_features_dc(
            model, codebook_dict["features_dc"])
        for d in range(model.max_sh_degree):
            ids[f"features_rest_{d}"] = (
                self.find_nearest_cluster_id_degree_features_rest(
                    model, d, codebook_dict[f"features_rest_{d}"]))
        ids["rotation_re"] = self.find_nearest_cluster_id_rotation_re(
            model, codebook_dict["rotation_re"])
        ids["rotation_im"] = self.find_nearest_cluster_id_rotation_im(
            model, codebook_dict["rotation_im"])
        ids["opacity"] = self.find_nearest_cluster_id_opacity(
            model, codebook_dict["opacity"])
        ids["scaling"] = self.find_nearest_cluster_id_scaling(
            model, codebook_dict["scaling"])
        return ids

    # --- quantize / dequantize (reference :177-218) -------------------------
    def quantize(self, model: GaussianModel, update_codebook: bool = True
                 ) -> Tuple[Dict, Dict]:
        if not self._codebook_dict or update_codebook:
            codebook_dict, ids_dict = self.produce_clusters(
                model, self._codebook_dict)
            self._codebook_dict = codebook_dict
        else:
            codebook_dict = self._codebook_dict
            ids_dict = self.find_nearest_cluster_id(model, codebook_dict)
        return ids_dict, codebook_dict

    def dequantize(self, model: GaussianModel, ids_dict, codebook_dict,
                   xyz=None, replace: bool = False) -> GaussianModel:
        cb = {k: jnp.asarray(v) for k, v in codebook_dict.items()}
        ids = {k: jnp.asarray(v) for k, v in ids_dict.items()}
        opacity = cb["opacity"][ids["opacity"]]
        scaling = cb["scaling"][ids["scaling"]]
        rotation = jnp.concatenate([cb["rotation_re"][ids["rotation_re"]],
                                    cb["rotation_im"][ids["rotation_im"]]], 1)
        features_dc = cb["features_dc"][ids["features_dc"]]
        rest = [cb[f"features_rest_{d}"][ids[f"features_rest_{d}"]]
                for d in range(model.max_sh_degree)]
        features_rest = jnp.concatenate(rest, axis=2).transpose(0, 2, 1)

        n = opacity.shape[0]
        params = model.parameters()

        def put(old, new):
            if replace and model._n_alive is None:
                return new
            return old.at[:n].set(new.astype(old.dtype))

        params = dict(params)
        if xyz is not None:
            params["xyz"] = put(params["xyz"], jnp.asarray(xyz))
        params["opacity"] = put(params["opacity"], opacity)
        params["scaling"] = put(params["scaling"], scaling)
        params["rotation"] = put(params["rotation"], rotation)
        params["features_dc"] = put(params["features_dc"], features_dc)
        params["features_rest"] = put(params["features_rest"], features_rest)
        if replace and model._n_alive is None:
            # shapes may differ from the previous params (fresh load)
            model._xyz = params["xyz"]
            model._opacity = params["opacity"]
            model._scaling = params["scaling"]
            model._rotation = params["rotation"]
            model._features_dc = params["features_dc"]
            model._features_rest = params["features_rest"]
        else:
            model.set_parameters(params)
        return model

    # --- quantized PLY I/O (reference :220-318, README.md:181-206) ----------
    def _code_dtype(self, n_clusters: int) -> str:
        return self.force_code_dtype or compute_uint_dtype(n_clusters)

    def save_quantized(self, model: GaussianModel, ply_path: str):
        import os
        os.makedirs(os.path.dirname(ply_path) or ".", exist_ok=True)
        ids_dict, codebook_dict = self.quantize(model, update_codebook=False)
        n = model.num_points
        xyz = np.asarray(_live(model, model._xyz))

        fields = OrderedDict()
        fields["x"], fields["y"], fields["z"] = (
            xyz[:, 0].astype("<f4"), xyz[:, 1].astype("<f4"),
            xyz[:, 2].astype("<f4"))
        for nm in ("nx", "ny", "nz"):
            fields[nm] = np.zeros(n, "<f4")
        fields["rot_re"] = np.asarray(ids_dict["rotation_re"]).astype(
            self._code_dtype(self.num_clusters_rotation_re))
        fields["rot_im"] = np.asarray(ids_dict["rotation_im"]).astype(
            self._code_dtype(self.num_clusters_rotation_im))
        fields["opacity"] = np.asarray(ids_dict["opacity"]).astype(
            self._code_dtype(self.num_clusters_opacity))
        fields["scale"] = np.asarray(ids_dict["scaling"]).astype(
            self._code_dtype(self.num_clusters_scaling))
        fields["f_dc"] = np.asarray(ids_dict["features_dc"])[:, 0].astype(
            self._code_dtype(self.num_clusters_features_dc))
        for d in range(model.max_sh_degree):
            codes = np.asarray(ids_dict[f"features_rest_{d}"])
            dt = self._code_dtype(self.num_clusters_features_rest[d])
            for ch in range(3):
                fields[f"f_rest_{d}_{ch}"] = codes[:, ch].astype(dt)
        vertex = plyio.fields_to_struct(fields, list(fields.keys()))

        def cb_struct(arr, prefix, n_cols):
            arr = np.asarray(arr).astype(self.force_codebook_dtype)
            cols = OrderedDict()
            if n_cols == 1:
                cols[prefix] = arr[:, 0]
            else:
                for i in range(n_cols):
                    cols[f"{prefix}_{i}"] = arr[:, i]
            return plyio.fields_to_struct(cols, list(cols.keys()))

        elements = OrderedDict()
        elements["vertex"] = vertex
        elements["codebook_rot_re"] = cb_struct(codebook_dict["rotation_re"], "rot_re", 1)
        elements["codebook_rot_im"] = cb_struct(codebook_dict["rotation_im"], "rot_im", 3)
        elements["codebook_opacity"] = cb_struct(codebook_dict["opacity"], "opacity", 1)
        elements["codebook_scaling"] = cb_struct(codebook_dict["scaling"], "scaling", 3)
        elements["codebook_f_dc"] = cb_struct(codebook_dict["features_dc"], "f_dc", 3)
        for d in range(model.max_sh_degree):
            n_ch = (d + 2) ** 2 - (d + 1) ** 2
            elements[f"codebook_f_rest_{d}"] = cb_struct(
                codebook_dict[f"features_rest_{d}"], f"f_rest_{d}", n_ch)
        plyio.write_ply(ply_path, elements)

    def parse_ids(self, elements, max_sh_degree: int) -> Dict:
        v = elements["vertex"]
        ids = {}
        ids["rotation_re"] = jnp.asarray(v["rot_re"].astype(np.int64))
        ids["rotation_im"] = jnp.asarray(v["rot_im"].astype(np.int64))
        ids["opacity"] = jnp.asarray(v["opacity"].astype(np.int64))
        ids["scaling"] = jnp.asarray(v["scale"].astype(np.int64))
        ids["features_dc"] = jnp.asarray(v["f_dc"].astype(np.int64))[:, None]
        for d in range(max_sh_degree):
            ids[f"features_rest_{d}"] = jnp.asarray(np.stack(
                [v[f"f_rest_{d}_{ch}"].astype(np.int64) for ch in range(3)], 1))
        return ids

    def parse_codebook(self, elements, max_sh_degree: int) -> Dict:
        cb = {}
        cb["rotation_re"] = jnp.asarray(
            elements["codebook_rot_re"]["rot_re"].astype(np.float32))[:, None]
        cb["rotation_im"] = jnp.asarray(np.stack(
            [elements["codebook_rot_im"][f"rot_im_{c}"] for c in range(3)],
            1).astype(np.float32))
        cb["opacity"] = jnp.asarray(
            elements["codebook_opacity"]["opacity"].astype(np.float32))[:, None]
        cb["scaling"] = jnp.asarray(np.stack(
            [elements["codebook_scaling"][f"scaling_{c}"] for c in range(3)],
            1).astype(np.float32))
        cb["features_dc"] = jnp.asarray(np.stack(
            [elements["codebook_f_dc"][f"f_dc_{c}"] for c in range(3)],
            1).astype(np.float32))
        for d in range(max_sh_degree):
            n_ch = (d + 2) ** 2 - (d + 1) ** 2
            cb[f"features_rest_{d}"] = jnp.asarray(np.stack(
                [elements[f"codebook_f_rest_{d}"][f"f_rest_{d}_{c}"]
                 for c in range(n_ch)], 1).astype(np.float32))
        return cb

    def parse_xyz(self, elements) -> jnp.ndarray:
        v = elements["vertex"]
        return jnp.asarray(np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32))

    def load_quantized(self, model: GaussianModel, ply_path: str) -> GaussianModel:
        elements = plyio.read_ply(ply_path)
        ids_dict = self.parse_ids(elements, model.max_sh_degree)
        codebook_dict = self.parse_codebook(elements, model.max_sh_degree)
        xyz = self.parse_xyz(elements)
        self._codebook_dict = codebook_dict
        return self.dequantize(model, ids_dict, codebook_dict, xyz=xyz,
                               replace=True)
