"""FacePipeline: detection -> alignment -> landmarks -> embeddings, batched.

Produces the metric contract of the reference's FaceAnalyzer
(analyzers/face.py:84-229):

- confidence (>= min_confidence) and min-size filtering;
- per-face: quality = det_score*10, eye sharpness = Laplacian variance of the
  two eye ROIs (landmarks 38/92, offset 0.15 x eye distance) normalized by
  mean intensity, /2 capped at 10; face-crop sharpness; 128px JPEG thumbnail;
- group aggregation: quality = 0.7*min + 0.3*avg, eye/face sharpness
  averaged, ANY blink flags the photo, combined bbox, group if >= N faces;
- EAR blink on the 106-point landmarks (indices L[35,39,37,38,41,40],
  R[89,93,91,92,95,94], threshold configurable).

Device batching: the detector sees one letterboxed 640x640 batch; all face
crops across the image batch are embedded / landmarked in single device
calls.
"""

import io

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from facet_tpu.models.face_models import (
    ARCFACE_DST,
    IResNet,
    LandmarkNet,
    nms,
    topk_to_detections,
    umeyama_similarity,
)
from facet_tpu.models.scrfd import SCRFD, SCRFD_10G, decode_topk

# fast speed tier (processing.speed_tier: "fast"): 448px detection canvas;
# must stay a multiple of the largest anchor stride (32)
FAST_TIER_DET_SIZE = 448

LEFT_EYE = [35, 39, 37, 38, 41, 40]
RIGHT_EYE = [89, 93, 91, 92, 95, 94]

EMPTY_RESULT = {
    "face_count": 0, "face_quality": 0, "eye_sharpness": 0, "is_blink": 0,
    "face_ratio": 0.0, "combined_bbox": None, "face_sharpness": 0,
    "raw_eye_sharpness": 0, "confidence": 0.0, "rows": [],
}


def calculate_ear(landmarks, indices):
    v1 = np.linalg.norm(landmarks[indices[2]] - landmarks[indices[4]])
    v2 = np.linalg.norm(landmarks[indices[3]] - landmarks[indices[5]])
    h = np.linalg.norm(landmarks[indices[0]] - landmarks[indices[1]])
    return (v1 + v2) / (2.0 * h) if h > 0 else 0.3


def average_ear(landmarks):
    return (calculate_ear(landmarks, LEFT_EYE) + calculate_ear(landmarks, RIGHT_EYE)) / 2.0


class FacePipeline:
    def __init__(self, det_params, landmark_params, embed_params, config=None,
                 det_config=SCRFD_10G):
        self.det_config = det_config
        self.detector = SCRFD(det_config)
        self.landmark_net = LandmarkNet()
        self.embedder = IResNet()
        self.det_params = det_params
        self.landmark_params = landmark_params
        self.embed_params = embed_params

        settings = config.get_face_detection_settings() if config else {}
        self.min_confidence = settings.get("min_confidence_percent", 70) / 100
        self.min_face_size = settings.get("min_face_size", 30)
        # detector candidate threshold before NMS (insightface det_thresh);
        # photo-level min_confidence filters again after
        self.score_threshold = 0.5
        self.blink_threshold = settings.get("blink_ear_threshold", 0.21)
        self.group_min = settings.get("min_faces_for_group", 4)
        fp = config.get_face_processing_settings() if config else {}
        self.crop_padding = fp.get("crop_padding", 0.3)

        # detection + device-side top-k decode in one program: only k
        # candidate rows per image cross back to the host (not full maps)
        self._detect_programs = {}   # (h, w) -> letterbox+detect+decode
        self._det_placed = None      # det params replicated on the dp mesh
        from facet_tpu.processing.device_pipeline import default_mesh

        self._mesh = default_mesh()
        self._landmarks = jax.jit(self.landmark_net.apply)
        self._embed = jax.jit(self.embedder.apply)
        # exact 2d106det path: the serialized ONNX graph executes directly
        # (models/onnx_exec.py) when converted — parity by construction
        from facet_tpu.models.checkpoints import load_landmark_graph

        self._landmark_graph = load_landmark_graph()

    def _run_landmarks(self, crops_u8):
        """(N, 192, 192, 3) uint8 crops -> (N, 106, 2) crop-space coords."""
        if self._landmark_graph is not None:
            # insightface Landmark preprocessing: raw RGB, mean 0 / std 1,
            # NCHW; output in [-1, 1] mapped to pixels by (x+1)*(192/2)
            x = crops_u8.astype(np.float32).transpose(0, 3, 1, 2)
            out = np.asarray(jax.device_get(self._landmark_graph(x)[0]))
            return (out.reshape(-1, 106, 2) + 1.0) * 96.0
        x = (crops_u8.astype(np.float32) - 127.5) / 127.5
        return np.asarray(jax.device_get(self._landmarks(
            self.landmark_params, jnp.asarray(x))))

    # -------------------------------------------------------------- factory

    @classmethod
    def create(cls, config, cached=None):
        from facet_tpu.models.checkpoints import load_or_none

        det_config = SCRFD_10G
        if config is not None and getattr(config, "speed_tier", None):
            if config.speed_tier() == "fast":
                # fast tier: 448px detection canvas instead of 640px — the
                # standard insightface det_size trade (the params are fully
                # convolutional, so the same checkpoint serves both tiers);
                # small faces below ~20px at original scale may be missed.
                # docs/SCORING.md documents the divergence.
                from dataclasses import replace

                det_config = replace(det_config,
                                     input_size=FAST_TIER_DET_SIZE)
        if cached is not None:
            return cls(cached["det"], cached["landmark"], cached["embed"],
                       config, det_config=det_config)
        det = load_or_none("scrfd_detector")
        lmk = load_or_none("landmark_106")
        emb = load_or_none("arcface_iresnet50")
        detector = SCRFD(det_config)
        from facet_tpu.models.checkpoints import _warn_once, fallback_init, sds

        if det is None:
            _warn_once("scrfd_detector")
            det = fallback_init(detector, sds(
                (1, det_config.input_size, det_config.input_size, 3)), seed=10)
        if lmk is None:
            lmk = fallback_init(LandmarkNet(), sds((1, 192, 192, 3)), seed=11)
        if emb is None:
            emb = fallback_init(IResNet(), sds((1, 112, 112, 3)), seed=12)
        return cls(det, lmk, emb, config, det_config=det_config)

    def host_params(self):
        to_host = lambda t: jax.tree.map(np.asarray, t)
        return {"det": to_host(self.det_params),
                "landmark": to_host(self.landmark_params),
                "embed": to_host(self.embed_params)}

    # ------------------------------------------------------------ detection

    def _detect_program(self, h, w):
        """Letterbox + SCRFD forward + top-k decode in ONE device program
        per source shape (shardable over the dp mesh): uint8 batch in, 64
        candidate rows per image out."""
        key = (h, w)
        if key not in self._detect_programs:
            from facet_tpu.ops.resize import resample_matrix

            size = self.det_config.input_size
            scale = size / max(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            rows = jnp.asarray(resample_matrix(h, nh, method="linear"))
            cols = jnp.asarray(resample_matrix(w, nw, method="linear"))

            @jax.jit
            def run(params, batch_u8):
                x = batch_u8.astype(jnp.float32)
                x = jnp.einsum("rh,bhwc->brwc", rows, x)
                x = jnp.einsum("sw,brwc->brsc", cols, x)
                canvas = jnp.pad(x, ((0, 0), (0, size - nh),
                                     (0, size - nw), (0, 0)))
                canvas = (canvas - 127.5) / 128.0
                return decode_topk(self.detector.apply(params, canvas))

            self._detect_programs[key] = (run, scale)
        return self._detect_programs[key]

    def det_params_for(self, mesh):
        """Detector params placed for `mesh` (replicated; cached). The
        replicated placement covers every mesh over the same devices, so
        the cache is mesh-shape-agnostic."""
        if mesh is None:
            return self.det_params
        if self._det_placed is None:
            from facet_tpu.parallel.mesh import replicated_sharding

            self._det_placed = jax.device_put(
                self.det_params, replicated_sharding(mesh))
        return self._det_placed

    def _run_detect(self, h, w, batch):
        run, scale = self._detect_program(h, w)
        if self._mesh is None:
            return jax.device_get(run(self.det_params,
                                      jnp.asarray(batch))), scale
        from facet_tpu.parallel.mesh import shard_batch

        sharded, _ = shard_batch(batch, self._mesh)
        return jax.device_get(run(self.det_params_for(self._mesh),
                                  sharded)), scale

    def decode_detections(self, det_out, scale, n):
        """Fetched (top, boxes, kps5) device results for the first `n`
        rows -> per image: list of dicts {score, bbox, kps} in image
        coords (threshold + NMS on host, like insightface)."""
        top, boxes, kps5 = det_out
        decoded = topk_to_detections(np.asarray(top)[:n],
                                     np.asarray(boxes)[:n],
                                     np.asarray(kps5)[:n],
                                     score_threshold=self.score_threshold)
        out = []
        for dets in decoded:
            kept = nms(dets)
            out.append([{"score": score, "bbox": bbox / scale,
                         "kps": kps / scale}
                        for score, bbox, kps in kept])
        return out

    def detect_batch(self, images):
        """-> per image: list of dicts {score, bbox, kps5} in image coords."""
        boxes_out = [None] * len(images)
        by_shape = {}
        for i, img in enumerate(images):
            by_shape.setdefault(img.shape[:2], []).append(i)
        for (h, w), idxs in by_shape.items():
            batch = np.stack([images[i] for i in idxs])
            det_out, scale = self._run_detect(h, w, batch)
            for i, dets in zip(idxs, self.decode_detections(
                    det_out, scale, len(idxs))):
                boxes_out[i] = dets
        return boxes_out

    # ------------------------------------------------------------- analysis

    def analyze_batch(self, images, detections=None):
        """RGB uint8 arrays -> list of photo-level face dicts (contract above).

        `detections` short-circuits the detection stage when the caller
        already dispatched it — the engine's joint path runs the detector
        on the SAME resident device batch as the fused scoring program
        (device_pipeline.FusedScorer.score_images) so the image batch
        crosses the host->device link once, not twice."""
        if detections is None:
            detections = self.detect_batch(images)

        # gather all surviving faces across the batch for batched crops
        jobs = []  # (img_idx, face_idx, det)
        for i, faces in enumerate(detections):
            kept = []
            for det in faces:
                if det["score"] < self.min_confidence:
                    continue
                x1, y1, x2, y2 = det["bbox"]
                if (x2 - x1) < self.min_face_size or (y2 - y1) < self.min_face_size:
                    continue
                kept.append(det)
            for j, det in enumerate(kept):
                jobs.append((i, j, det))

        if jobs:
            aligned = np.stack([
                self._align_crop(images[i], det["kps"]) for i, _, det in jobs])
            lmk_crops, lmk_meta = [], []
            for i, _, det in jobs:
                crop, meta = self._landmark_crop(images[i], det["bbox"])
                lmk_crops.append(crop)
                lmk_meta.append(meta)
            embeddings = np.asarray(jax.device_get(self._embed(
                self.embed_params, jnp.asarray(aligned))))
            lmk_out = self._run_landmarks(np.stack(lmk_crops))
        results = []
        job_pos = 0
        for i, image in enumerate(images):
            my_jobs = []
            while job_pos + len(my_jobs) < len(jobs) and jobs[job_pos + len(my_jobs)][0] == i:
                my_jobs.append(jobs[job_pos + len(my_jobs)])
            if not my_jobs:
                results.append(dict(EMPTY_RESULT))
                continue
            faces = []
            for k, (_, _, det) in enumerate(my_jobs):
                idx = job_pos + k
                center, size = lmk_meta[idx]
                lmk = lmk_out[idx] / 192.0 * size + (center - size / 2.0)
                faces.append({
                    "det": det,
                    "embedding": embeddings[idx],
                    "landmarks": lmk.astype(np.float32),
                })
            job_pos += len(my_jobs)
            results.append(self._aggregate(image, faces))
        return results

    # --------------------------------------------------------------- helpers

    @staticmethod
    def _align_crop(image, kps5):
        m = umeyama_similarity(kps5.astype(np.float32), ARCFACE_DST)
        warped = cv2.warpAffine(image, m, (112, 112), borderValue=0)
        return (warped.astype(np.float32) - 127.5) / 127.5

    @staticmethod
    def _landmark_crop(image, bbox):
        h, w = image.shape[:2]
        cx = (bbox[0] + bbox[2]) / 2
        cy = (bbox[1] + bbox[3]) / 2
        size = max(bbox[2] - bbox[0], bbox[3] - bbox[1]) * 1.5
        x1 = int(round(cx - size / 2))
        y1 = int(round(cy - size / 2))
        crop = np.zeros((int(size) + 1, int(size) + 1, 3), np.uint8)
        sx1, sy1 = max(0, x1), max(0, y1)
        sx2 = min(w, x1 + crop.shape[1])
        sy2 = min(h, y1 + crop.shape[0])
        if sx2 > sx1 and sy2 > sy1:
            crop[sy1 - y1:sy2 - y1, sx1 - x1:sx2 - x1] = image[sy1:sy2, sx1:sx2]
        resized = cv2.resize(crop, (192, 192))
        return resized, (np.array([cx, cy], np.float32), float(size))

    def _crop_thumbnail(self, image, bbox, size=128, quality=85):
        h, w = image.shape[:2]
        bw, bh = bbox[2] - bbox[0], bbox[3] - bbox[1]
        pad_x, pad_y = bw * self.crop_padding, bh * self.crop_padding
        x1 = int(max(0, bbox[0] - pad_x))
        y1 = int(max(0, bbox[1] - pad_y))
        x2 = int(min(w, bbox[2] + pad_x))
        y2 = int(min(h, bbox[3] + pad_y))
        crop = image[y1:y2, x1:x2]
        if crop.size == 0:
            return None
        pil = Image.fromarray(crop)
        pil.thumbnail((size, size))
        buf = io.BytesIO()
        pil.save(buf, "JPEG", quality=quality)
        return buf.getvalue()

    def _eye_sharpness(self, image, gray, landmarks):
        h, w = image.shape[:2]
        l_eye, r_eye = landmarks[38], landmarks[92]
        eye_dist = np.linalg.norm(l_eye - r_eye)
        offset = int(eye_dist * 0.15)
        scores = []
        for ex, ey in (l_eye, r_eye):
            x1, x2 = int(ex - offset), int(ex + offset)
            y1, y2 = int(ey - offset), int(ey + offset)
            roi = gray[max(0, y1):min(h, y2), max(0, x1):min(w, x2)]
            if roi.size > 0:
                scores.append(cv2.Laplacian(roi, cv2.CV_64F).var()
                              / (float(np.mean(roi)) + 1))
        return max(scores) if scores else 0.0

    def _aggregate(self, image, faces):
        h, w = image.shape[:2]
        gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)

        qualities, eye_scores, raw_eyes, sharpness = [], [], [], []
        any_blink = False
        total_area = 0
        min_x, min_y, max_x, max_y = w, h, 0, 0
        rows = []
        for idx, face in enumerate(faces):
            det = face["det"]
            bbox = det["bbox"].astype(int)
            min_x, min_y = min(min_x, bbox[0]), min(min_y, bbox[1])
            max_x, max_y = max(max_x, bbox[2]), max(max_y, bbox[3])
            qualities.append(det["score"] * 10)

            raw_eye = self._eye_sharpness(image, gray, face["landmarks"])
            eye_scores.append(min(10.0, raw_eye / 2.0))
            raw_eyes.append(raw_eye)

            crop = gray[max(0, bbox[1]):min(h, bbox[3]),
                        max(0, bbox[0]):min(w, bbox[2])]
            sharpness.append(
                cv2.Laplacian(crop, cv2.CV_64F).var() if crop.size else 0.0)

            if average_ear(face["landmarks"]) < self.blink_threshold:
                any_blink = True
            total_area += (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])

            rows.append({
                "face_index": idx,
                "bbox": [int(v) for v in bbox],
                "confidence": float(det["score"]),
                "embedding": face["embedding"].astype(np.float32).tobytes(),
                "landmarks": face["landmarks"].astype(np.float32).tobytes(),
                "thumbnail": self._crop_thumbnail(image, bbox),
            })

        face_quality = round(0.7 * min(qualities) + 0.3 * (sum(qualities) / len(qualities)), 2)
        return {
            "face_count": len(faces),
            "face_quality": face_quality,
            "eye_sharpness": round(sum(eye_scores) / len(eye_scores), 2),
            "raw_eye_sharpness": sum(raw_eyes) / len(raw_eyes),
            "face_sharpness": sum(sharpness) / len(sharpness),
            "is_blink": 1 if any_blink else 0,
            "face_ratio": min(1.0, total_area / (h * w)),
            "combined_bbox": [min_x, min_y, max_x, max_y],
            "confidence": max(f["det"]["score"] for f in faces),
            "rows": rows,
        }
