"""Inference API: init a detector from config+checkpoint, run on images.

Replaces monorun/apis/inference.py (init_detector/inference_detector). A
single jitted program serves any batch size up to the compiled one; calib
can come from a KITTI calib file, a CSV (demo/calib.csv style), or a raw
3x3 matrix.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MonoRUnConfig, get_config
from ..data.pipeline import load_image, normalize_pad
from ..models import MonoRUn, init_detector


def _precast_kernels(cfg: MonoRUnConfig, variables):
    """Pre-cast >=2-D param kernels to the compute dtype.

    Under compute_dtype=bfloat16 every conv/dense kernel is cast to bf16
    at trace time anyway, so this is numerically identical — but halves
    the executable's embedded-constant bytes (the frozen-weight jit in
    InferenceSession bakes weights into the program). 1-D leaves (biases,
    BN statistics, calibration scales) keep f32.
    """
    if cfg.compute_dtype != "bfloat16":
        return variables
    import flax

    variables = flax.core.unfreeze(variables)

    def cast(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and x.dtype == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x

    # one jitted program for the whole tree: per-leaf eager casts are a
    # device round trip each (minutes over the remote tunnel)
    variables["params"] = jax.jit(
        lambda p: jax.tree.map(cast, p)
    )(variables["params"])
    return variables


class InferenceSession:
    """Holds the model, variables, and the compiled forward.

    With ``mesh`` set (reference: MMDistributedDataParallel test path,
    tools/test.py:181-187), variables are replicated and every input's
    batch axis is sharded over the mesh's 'data' axis; XLA partitions the
    one inference program across the devices. ``batch_size`` must then be
    a multiple of the mesh size.
    """

    def __init__(self, cfg: MonoRUnConfig, variables, batch_size: int = 1,
                 mesh=None, freeze: str = "none", warm: bool = True,
                 raw: bool = False):
        """``raw=True`` serves the uint8-canvas program: ``run`` then
        expects (B, raw_height, raw_width, 3) uint8 canvases (images
        pasted top-left at native resolution), NATIVE intrinsics and
        native (h, w) shapes; resize/normalize/pad + the test_scale
        intrinsic rescale run inside the jitted program
        (data/pipeline.py:device_preprocess)."""
        self.cfg = cfg
        self.model = MonoRUn(cfg)
        self.mesh = mesh
        self.raw = raw
        # parallel cold-start warm-up: AOT-compile backbone / heads /
        # align-kernel pieces concurrently (utils/warm_start.py).
        # Best-effort: single-device TPU only (sharded programs have
        # different per-shard content), and never fatal.
        # In split mode (freeze="none" only) the two executables compiled
        # by the warm-up — backbone and heads, lowered at the exact
        # serving avals — ARE the serving program: run() calls them back
        # to back, so the first batch pays no further compile at all
        # (bench.py A/B: identical checksums and fps vs the monolith,
        # compile+first 121.7 s -> ~5 s after warm-up).
        self._progs = None
        if warm and mesh is None and jax.default_backend() == "tpu":
            # open the host-fetch channel immediately: the remote-TPU
            # tunnel stalls minutes on a process's FIRST device->host
            # fetch (measured 116-667 s, independent of program size);
            # paying it on a trivial program in a daemon thread overlaps
            # the wall with the warm-up compiles below (see bench.py)
            import threading

            def _open_fetch_channel():
                try:
                    float(jax.jit(lambda a: a + 1.0)(
                        jnp.zeros((8, 128), jnp.float32))[0, 0])
                except Exception:  # pragma: no cover - best effort
                    pass

            threading.Thread(
                target=_open_fetch_channel, daemon=True
            ).start()
            try:
                from ..utils.warm_start import warm_start

                if freeze == "none":
                    _, self._progs = warm_start(
                        cfg, self.model, batch_size, return_programs=True,
                        raw=raw,
                    )
                else:
                    warm_start(cfg, self.model, batch_size, raw=raw)
            except Exception as e:  # pragma: no cover - best effort
                print(f"[InferenceSession] warm_start skipped: {e}")
        if mesh is not None:
            from ..parallel import replicate

            variables = replicate(variables, mesh)
        self.variables = variables
        self.batch_size = batch_size
        # freeze selects which param subtrees are CLOSED OVER as
        # executable constants vs passed as runtime args. Round-2 measured
        # +2.4x from baking the backbone, but the space-to-depth stem and
        # later kernel work erased that edge: round-3 A/B on v5e at batch
        # 8 reads 88.8 / 88.8 / 89.3 fps for none / backbone / all while
        # cold compile reads 98.7 / 281.9 / 441.6 s — constant-baking now
        # buys nothing and costs minutes of every fresh-environment start,
        # so the default is "none". "backbone"/"all" remain for A/B.
        import flax

        allvars = flax.core.unfreeze(_precast_kernels(cfg, variables))
        params = dict(allvars["params"])
        other = {k: v for k, v in allvars.items() if k != "params"}
        baked_keys = {
            "all": set(params),
            "backbone": {"backbone", "neck"},
            "none": set(),
        }[freeze]
        const_p = {k: v for k, v in params.items() if k in baked_keys}
        self._live = {k: v for k, v in params.items() if k not in baked_keys}
        self._allvars = {**other, "params": params}
        if raw:
            self._fn = jax.jit(
                lambda live, img, cam, shp, key: self.model.apply(
                    {**other, "params": {**const_p, **live}},
                    img, cam, shp, key, method=self.model.serve_raw,
                )
            )
        else:
            self._fn = jax.jit(
                lambda live, img, cam, shp, key: self.model.apply(
                    {**other, "params": {**const_p, **live}},
                    img, cam, shp, key,
                )
            )

    def run(
        self,
        images: np.ndarray,        # (B, H, W, 3) already normalised+padded
        cam: np.ndarray,           # (B, 3, 3)
        shapes: np.ndarray,        # (B, 2)
        seed: int = 0,
    ):
        if self.mesh is not None:
            from ..parallel import shard_batch

            images, cam, shapes = shard_batch(
                (jnp.asarray(images), jnp.asarray(cam), jnp.asarray(shapes)),
                self.mesh,
            )
        dc = self.cfg.data
        h, w = (
            (dc.raw_height, dc.raw_width) if self.raw
            else (dc.pad_height, dc.pad_width)
        )
        # the warmed executables are lowered at exactly (batch_size, h, w,
        # 3); a mismatched call (tail batch, odd resolution) falls back to
        # the monolithic jit for THIS call only — the warmed programs stay
        # valid for correctly-shaped calls
        split_ok = (
            self._progs is not None
            and tuple(np.shape(images)) == (self.batch_size, h, w, 3)
        )
        if split_ok:
            try:
                if self.raw:
                    from ..data.pipeline import scale_intrinsics

                    s = float(dc.test_scale)
                    feats = self._progs["backbone"](
                        self._allvars,
                        jnp.asarray(images, jnp.uint8),
                        jnp.asarray(shapes, jnp.float32),
                    )
                    return self._progs["heads"](
                        self._allvars, feats,
                        scale_intrinsics(jnp.asarray(cam, jnp.float32), s),
                        jnp.round(jnp.asarray(shapes, jnp.float32) * s),
                        jax.random.PRNGKey(seed),
                    )
                feats = self._progs["backbone"](
                    self._allvars,
                    jnp.asarray(images, jnp.float32),
                )
                return self._progs["heads"](
                    self._allvars, feats,
                    jnp.asarray(cam, jnp.float32),
                    jnp.asarray(shapes, jnp.float32),
                    jax.random.PRNGKey(seed),
                )
            except Exception as e:  # genuine program error — disable split
                print(f"[InferenceSession] split path failed ({e}); "
                      "falling back to the monolithic program")
                self._progs = None
        return self._fn(
            self._live, jnp.asarray(images), jnp.asarray(cam),
            jnp.asarray(shapes), jax.random.PRNGKey(seed),
        )


def init_inference(
    config: str | MonoRUnConfig,
    checkpoint: Optional[str] = None,
    batch_size: int = 1,
    mesh=None,
    freeze: str = "none",
    explicit_lazy: bool = False,
) -> InferenceSession:
    """Build an InferenceSession from a config (preset name or object).

    Loading a converted reference ``.pth`` defaults ``neck.lazy_lower``
    OFF: those ``lower0`` weights were trained on the reference's
    2x-upsampled grid (fpn_plus.py:79-91), and the lazy level is an
    approximation of it (models/fpn.py). Pass ``explicit_lazy=True``
    when the caller set ``neck.lazy_lower`` deliberately (e.g. via
    ``--cfg-options``) to keep their choice.
    """
    cfg = get_config(config) if isinstance(config, str) else config
    if (
        checkpoint
        and checkpoint.endswith(".pth")
        and cfg.neck.lazy_lower
        and not explicit_lazy
    ):
        import dataclasses

        cfg = dataclasses.replace(
            cfg, neck=dataclasses.replace(cfg.neck, lazy_lower=False)
        )
        print(
            "[init_inference] .pth checkpoint: neck.lazy_lower -> False "
            "(reference-faithful dense stride-2 level; override with "
            "--cfg-options neck.lazy_lower=True)"
        )
    h, w = cfg.data.pad_height, cfg.data.pad_width
    # fast structural init: serving never needs the traced-init values
    # (checkpoints overwrite them; without a checkpoint the weights are
    # random either way), and the traced init compiles the entire forward
    # program — 250-720 s of every cold start (tools/cold_profile.py)
    _, variables = init_detector(cfg, jax.random.PRNGKey(0), (h, w),
                                 fast=True)
    if checkpoint:
        variables = load_weights(cfg, variables, checkpoint)
    return InferenceSession(cfg, variables, batch_size, mesh=mesh,
                            freeze=freeze)


def load_weights(cfg: MonoRUnConfig, variables, checkpoint: str):
    """Load weights from an orbax dir or a reference .pth file."""
    import flax

    variables = flax.core.unfreeze(variables)
    if checkpoint.endswith(".pth"):
        from ..utils.checkpoint import convert_torch_checkpoint

        params, batch_stats, _, report = convert_torch_checkpoint(
            checkpoint, variables["params"], variables["batch_stats"]
        )
        n_bad = sum(1 for v in report.values() if v != "ok")
        if n_bad:
            bad = {k: v for k, v in report.items() if v != "ok"}
            print(f"[load_weights] {n_bad} keys not placed: {bad}")
        variables["params"] = params
        variables["batch_stats"] = batch_stats
    else:
        from ..utils.checkpoint import load_checkpoint

        restored = load_checkpoint(
            checkpoint,
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
        )
        variables.update(restored)
    return variables


def inference_detector(
    session: InferenceSession,
    image_paths: Sequence[str],
    cam_intrinsics: Sequence[np.ndarray],
    seed: int = 0,
) -> List[Dict[str, np.ndarray]]:
    """Run detection on image files; returns per-image result dicts
    (bboxes_2d, labels, bboxes_3d, valid, pose_cov) in numpy."""
    cfg = session.cfg
    results = []
    B = session.batch_size
    for i in range(0, len(image_paths), B):
        chunk = image_paths[i : i + B]
        cams = cam_intrinsics[i : i + B]
        s = float(cfg.data.test_scale)
        if s != 1.0:
            import cv2

            cams = [c.copy() for c in cams]
            for c in cams:
                c[:2] *= s
        imgs, shapes = [], []
        for p in chunk:
            img = load_image(p, cfg.data.to_rgb)
            if s != 1.0:
                h, w = img.shape[:2]
                img = cv2.resize(
                    img, (int(round(w * s)), int(round(h * s))),
                    interpolation=cv2.INTER_LINEAR,
                )
            padded, (rh, rw) = normalize_pad(img, cfg.data)
            imgs.append(padded)
            shapes.append([float(rh), float(rw)])
        while len(imgs) < B:   # pad the tail batch
            imgs.append(np.zeros_like(imgs[0]))
            cams = list(cams) + [cams[-1]]
            shapes.append(shapes[-1])
        det = session.run(
            np.stack(imgs), np.stack(cams).astype(np.float32),
            np.asarray(shapes, np.float32), seed=seed + i,
        )
        for b in range(len(chunk)):
            results.append(
                dict(
                    bboxes_2d=np.asarray(det.bboxes_2d[b]) / s,
                    scores_2d=np.asarray(det.scores_2d[b]),
                    labels=np.asarray(det.labels[b]),
                    bboxes_3d=np.asarray(det.bboxes_3d[b]),
                    valid=np.asarray(det.valid[b]),
                    pose_cov=np.asarray(det.pose_cov[b]),
                )
            )
    return results


def read_calib_csv(path: str) -> np.ndarray:
    """demo/calib.csv style: 3x3 intrinsic matrix as comma-separated rows."""
    return np.loadtxt(path, delimiter=",").astype(np.float32).reshape(3, 3)
