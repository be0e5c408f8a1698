"""Fused single-program scoring pipeline.

One jitted XLA program per input shape computes EVERYTHING the ensemble needs
from a raw uint8 batch: the technical statistics histograms, the pHash bits,
the CLIP crop (separable-matmul resize), the ViT forward and the aesthetic
head. One host->device transfer in, a few KB of results out — the TPU-first
shape of the engine's hot path (vs the reference's per-stage host round
trips).

On a multi-chip slice the batch is sharded over a 1-D 'dp' mesh (params
replicated): every op in the program is per-image, so the whole program runs
under shard_map over 'dp' with zero collectives and each chip scores
batch/n_devices images (shard_map rather than sharding propagation because
the TPU path embeds a pallas kernel — the ILP entropy — which has no GSPMD
partitioning rule). Single-device backends (the 1-chip bench harness) take
the unsharded path unchanged.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from facet_tpu.models.aesthetic import AestheticHead
from facet_tpu.models.clip import CLIP_MEAN, CLIP_STD, CLIPVisionTower
from facet_tpu.ops.colorspace import rgb_to_gray
from facet_tpu.ops.phash import HASH_SIZE, RESIZE, _area_weights, _dct_matrix
from facet_tpu.ops.resize import clip_preprocess_matrices
from facet_tpu.ops.stats import _batch_stats_impl


def build_fused_pipeline(vision_tower: CLIPVisionTower, head: AestheticHead,
                         src_h, src_w, hs_subsample=1, entropy_impl="auto",
                         attn_impl="auto", quant="auto", mesh=None):
    """-> jitted fn(vision_params, head_params, uint8 batch) for one shape.

    Returns per image: aesthetic score, normalized embedding, phash bits,
    gray/sat histograms, HS entropy, Laplacian + Immerkaer histograms.

    hs_subsample / entropy_impl select the H-S entropy path (see
    ops/stats._batch_stats_impl); with entropy_impl="none" the dict's
    "hs_entropy" entry is the (hue, sat) pixel-stream pair for a separate
    entropy program instead of the reduced scalar. attn_impl selects the
    ViT attention path (models/clip.resolve_attn_impl): "xla" everywhere
    by default — flash measured slower at this sequence length and is
    kept only as a probe path.

    On a mesh the WHOLE program runs under shard_map over 'dp' — every op
    is per-image, so each device runs the identical program on its batch
    shard with zero collectives. This is load-bearing, not a style choice:
    the production TPU path embeds a pallas kernel (the ILP entropy) and
    a pallas_call has no GSPMD partitioning rule, so plain sharding
    propagation would gather the batch onto one device at the kernel.
    """
    from facet_tpu.models.clip import resolve_attn_impl, resolve_quant_impl
    from facet_tpu.ops.stats import resolve_entropy_impl

    entropy_impl = resolve_entropy_impl(entropy_impl)
    attn_impl = resolve_attn_impl(attn_impl)
    quant = resolve_quant_impl(quant)
    if attn_impl != vision_tower.attn_impl or quant != vision_tower.quant:
        # same params, different compute schedule — attn_impl/quant are not
        # parameter-bearing attributes, so the clone applies the checkpoint
        # unchanged
        vision_tower = vision_tower.clone(attn_impl=attn_impl, quant=quant)
    target = vision_tower.config.image_size
    rows, cols = clip_preprocess_matrices(src_h, src_w, target)
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    hash_rows = jnp.asarray(_area_weights(src_h, RESIZE))
    hash_cols = jnp.asarray(_area_weights(src_w, RESIZE))
    dct = jnp.asarray(_dct_matrix())

    def pipeline(vision_params, head_params, batch_u8):
        # --- classical statistics (compare-reduce + tiled sums + MXU hist)
        (gray_hist, sat_tiles, entropy,
         lap_tiles, lapsq_tiles, imm_tiles) = _batch_stats_impl(
             batch_u8, hs_subsample=hs_subsample, entropy_impl=entropy_impl)

        fbatch = batch_u8.astype(jnp.float32)

        # --- pHash: area resize + DCT as matmuls (canonical exact-cv2
        # gray, the same op ops/phash.py uses — one source of truth)
        gray = rgb_to_gray(batch_u8).astype(jnp.float32)
        small = jnp.einsum("rh,bhw,cw->brc", hash_rows, gray, hash_cols)
        freq = dct @ small @ dct.T
        low = freq[:, :HASH_SIZE, :HASH_SIZE].reshape(-1, HASH_SIZE * HASH_SIZE)
        med = jnp.median(low, axis=1, keepdims=True)
        hash_bits = low > med

        # --- CLIP aesthetic: resize-crop + normalize + ViT + head
        crops = jnp.einsum("rh,bhwc->brwc", rows, fbatch)
        crops = jnp.einsum("sw,brwc->brsc", cols, crops)
        x = crops / 255.0
        x = (x - CLIP_MEAN) / CLIP_STD
        features = vision_tower.apply(vision_params, x)
        raw = head.apply(head_params, features)[:, 0]
        scores = jnp.clip((raw + 1.0) * 5.0, 0.0, 10.0)
        embeddings = features / jnp.linalg.norm(features, axis=-1, keepdims=True)

        return {
            "aesthetic": scores,
            "embedding": embeddings,
            "hash_bits": hash_bits,
            "gray_hist": gray_hist,
            "sat_tiles": sat_tiles,
            "hs_entropy": entropy,
            "lap_tiles": lap_tiles,
            "lapsq_tiles": lapsq_tiles,
            "imm_tiles": imm_tiles,
        }

    if mesh is None:
        return jax.jit(pipeline)

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    return jax.jit(shard_map(
        pipeline, mesh=mesh,
        in_specs=(P(), P(), P("dp")),       # params replicated, batch split
        out_specs=P("dp"), check_rep=False))


def default_mesh():
    """1-D data-parallel mesh over all local devices, or None when a single
    device (or FACET_DISABLE_DP=1) makes sharding pointless."""
    if os.environ.get("FACET_DISABLE_DP"):
        return None
    from facet_tpu.parallel.mesh import get_mesh, local_device_count

    if local_device_count() <= 1:
        return None
    return get_mesh(tp=1)


class FusedScorer:
    """Engine-facing wrapper: one device call per shape group computes
    aesthetic + embedding + pHash + all technical statistics.

    Replaces the separate stats/phash/CLIP calls (3 transfers of the full
    image batch) with a single transfer + single program.
    """

    def __init__(self, vision_tower, head, vision_params, head_params,
                 mesh="auto", hs_subsample=1):
        self.vision_tower = vision_tower
        self.head = head
        self.vision_params = vision_params
        self.head_params = head_params
        self.mesh = default_mesh() if mesh == "auto" else mesh
        # fast mode (processing.fast_color_harmony): stride the entropy's
        # pixel stream; every other statistic stays exact
        self.hs_subsample = hs_subsample
        self._mesh_params = None  # params replicated onto the mesh, lazily
        self._pipelines = {}

    @classmethod
    def from_aesthetic_scorer(cls, scorer, mesh="auto", hs_subsample=1):
        return cls(scorer.vision, scorer.head,
                   scorer.vision_params, scorer.head_params, mesh=mesh,
                   hs_subsample=hs_subsample)

    def _pipeline(self, h, w):
        key = (h, w)
        if key not in self._pipelines:
            self._pipelines[key] = build_fused_pipeline(
                self.vision_tower, self.head, h, w,
                hs_subsample=self.hs_subsample, mesh=self.mesh)
        return self._pipelines[key]

    def _placed_params(self):
        """Params replicated onto every mesh device (one transfer, cached)."""
        if self._mesh_params is None:
            from facet_tpu.parallel.mesh import replicated_sharding

            sharding = replicated_sharding(self.mesh)
            self._mesh_params = (
                jax.device_put(self.vision_params, sharding),
                jax.device_put(self.head_params, sharding),
            )
        return self._mesh_params

    def _place_batch(self, batch):
        """Host batch -> device array (sharded over 'dp' on a mesh) plus
        the fused-program params to call with."""
        if self.mesh is None:
            return jnp.asarray(batch), (self.vision_params, self.head_params)
        from facet_tpu.parallel.mesh import shard_batch

        sharded, _ = shard_batch(batch, self.mesh)
        return sharded, self._placed_params()

    def _run(self, h, w, batch):
        """One fused program call; batch-sharded over 'dp' on a mesh."""
        dev, (vp, hp) = self._place_batch(batch)
        # the pipeline is shard_mapped over 'dp': per-image math partitions
        # with no collectives; padding rows are sliced off by the caller
        # (it indexes only the real images)
        return jax.device_get(self._pipeline(h, w)(vp, hp, dev))

    def score_images(self, images, face_pipeline=None, riders=None):
        """List of RGB uint8 arrays -> aligned list of
        (aesthetic, embedding_bytes, phash_hex, ImageStats).

        Shape groups are chunked at 256 and each chunk zero-pads to a
        power-of-two bucket (the compute_batch_stats discipline,
        ops/stats.py _bucket_size) so a mixed-size library produces at
        most ~9 compiled batch lengths per image shape instead of one
        full fused-program recompile per distinct (shape, count) pair.

        With `face_pipeline`, the SCRFD detection program is dispatched on
        the SAME resident device batch, back-to-back with the fused
        program, and both are fetched in one device_get — the engine's
        steady state then matches the dispatch discipline bench.py
        measures (serialized fetch-per-program ran 83.8 vs 123.0 img/s
        pipelined at b64, docs/PERF.md), and the image batch crosses the
        host->device link once instead of twice.

        `riders` extends the same discipline to other ensemble members
        bin-packed into the fused program's pass group: a dict of
        name -> scorer exposing `rider(h, w) -> (run, finish)` (TOPIQ and
        SAMP implement it). Each rider's program is dispatched on the
        resident buffer back-to-back with the fused program and fetched in
        the same device_get, so a group of clip+topiq+samp+insightface
        transfers the full-resolution batch ONCE per chunk instead of four
        times. Riders must be built on the same mesh as this scorer (both
        default to `default_mesh()`).

        Returns `results` alone with neither extra, (results, detections)
        with only `face_pipeline` (detections in detect_batch's format),
        or (results, detections, rider_results) whenever `riders` is not
        None (an empty dict still selects the 3-tuple form) — detections
        then None without `face_pipeline`, rider_results mapping each
        rider name to its aligned output list.
        """
        from facet_tpu.ops.phash import _bits_to_hex
        from facet_tpu.ops.stats import ImageStats, _bucket_size, split_total

        results = [None] * len(images)
        detections = [None] * len(images) if face_pipeline is not None else None
        riders_passed = riders is not None
        riders = riders or {}
        rider_results = {name: [None] * len(images) for name in riders}
        by_shape = {}
        for i, img in enumerate(images):
            by_shape.setdefault(img.shape[:2], []).append(i)
        for member, scorer in riders.items():
            # rider programs run on THIS scorer's resident device batch but
            # are built (shard_mapped) on the RIDER's own mesh, so a
            # mismatch (e.g. scorer mesh=None with default-mesh riders)
            # would otherwise surface as an opaque shard_map/resharding
            # error far from the misconfiguration (round-4 advisor). The
            # face pipeline needs no check: its detect program is plain
            # jax.jit and takes this scorer's mesh via det_params_for.
            other = getattr(scorer, "mesh", getattr(scorer, "_mesh", None))
            if (other is None) != (self.mesh is None) or (
                    other is not None and other != self.mesh):
                raise ValueError(
                    f"joint-dispatch member {member!r} was built on mesh "
                    f"{other} but the FusedScorer uses {self.mesh}; riders "
                    f"must share the scorer's mesh (both default to "
                    f"default_mesh())")
        for (h, w), all_idxs in by_shape.items():
            det_run = det_scale = det_params = None
            if face_pipeline is not None:
                det_run, det_scale = face_pipeline._detect_program(h, w)
                det_params = face_pipeline.det_params_for(self.mesh)
            rider_progs = {name: scorer.rider(h, w)
                           for name, scorer in riders.items()}
            for start in range(0, len(all_idxs), 256):
                idxs = all_idxs[start:start + 256]
                batch = np.zeros((_bucket_size(len(idxs)), h, w, 3), np.uint8)
                for j, idx in enumerate(idxs):
                    batch[j] = images[idx]
                if det_run is not None or rider_progs:
                    dev, (vp, hp) = self._place_batch(batch)
                    out = self._pipeline(h, w)(vp, hp, dev)
                    det_out = (det_run(det_params, dev)
                               if det_run is not None else None)
                    rider_out = {name: run(dev)
                                 for name, (run, _) in rider_progs.items()}
                    out, det_out, rider_out = jax.device_get(
                        (out, det_out, rider_out))
                    if det_run is not None:
                        for idx, dets in zip(
                                idxs, face_pipeline.decode_detections(
                                    det_out, det_scale, len(idxs))):
                            detections[idx] = dets
                    for name, (_, finish) in rider_progs.items():
                        for idx, val in zip(
                                idxs, finish(rider_out[name], len(idxs))):
                            rider_results[name][idx] = val
                else:
                    out = self._run(h, w, batch)
                self._collect(out, idxs, h, w, results,
                              ImageStats, split_total, _bits_to_hex)
        if riders_passed:
            return results, detections, rider_results
        if face_pipeline is not None:
            return results, detections
        return results

    @staticmethod
    def _collect(out, idxs, h, w, results, ImageStats, split_total,
                 _bits_to_hex):
        for j, idx in enumerate(idxs):
            stats = ImageStats(
                height=h, width=w,
                gray_hist=np.asarray(out["gray_hist"][j]),
                sat_sum=split_total(out["sat_tiles"][j], 12),
                hs_entropy=float(out["hs_entropy"][j]),
                lap_sum=split_total(out["lap_tiles"][j], 12),
                lap_sumsq=split_total(out["lapsq_tiles"][j], 16),
                imm_abs_sum=split_total(out["imm_tiles"][j], 12),
            )
            results[idx] = (
                float(out["aesthetic"][j]),
                np.asarray(out["embedding"][j], np.float32).tobytes(),
                _bits_to_hex(np.asarray(out["hash_bits"][j])),
                stats,
            )
