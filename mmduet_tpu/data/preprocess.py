"""Offline preprocessing tools: re-encode videos + pre-extract features.

Rebuild of the reference's offline pipeline (`data/utils.py:63-117`):

- :func:`ffmpeg_once` — same ffmpeg CLI contract (skip-if-exists, strip
  audio, fps resample, aspect-preserving scale + centered pad), with a
  cv2 fallback (:func:`reencode_video_cv2`) for hosts without an ffmpeg
  binary;
- :func:`sharded_reencode` — batch re-encode sharded by host index
  (replaces the reference's submitit/SLURM sharding,
  `data/utils.py:81-97`: on a TPU pod, pass ``num_shards=jax.process_count()``
  and ``shard_index=jax.process_index()``, or drive with GNU parallel);
- :func:`extract_features` / :func:`sharded_extract` — decode each video
  and run the SigLIP tower, saving per-video patch features as ``.npy``
  (the reference saves ``.pt``, `data/utils.py:99-117`). Saved features
  are RAW tower patches (N, num_patches, vision_hidden): the training
  collator consumes them as ``vision_feats`` (projector + pooling stay
  inside the differentiated step) and the engine consumes them via
  ``input_vision_feats`` (projector + pooling applied on device once).

CLI:
    python -m mmduet_tpu.data.preprocess reencode --src_root d/videos \\
        --fps 2 --resolution 384 [--num_shards 8 --shard_index 0]
    python -m mmduet_tpu.data.preprocess encode --src_root d/videos_2fps_max384 \\
        --checkpoint <ckpt> --fps 2 [--batch_size 32] [--bf16]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
from functools import partial
from typing import Callable, List, Optional

import numpy as np

VIDEO_EXTS = (".mp4", ".mkv", ".avi", ".webm", ".mov")


def ffmpeg_once(
    src_path: str,
    dst_path: str,
    *,
    fps: Optional[int] = None,
    resolution: Optional[int] = None,
    pad: str = "#000000",
    mode: str = "bicubic",
    ffmpeg_bin: str = "ffmpeg",
) -> None:
    """Re-encode one video (same CLI contract as reference
    `data/utils.py:63-79`): ``-n`` skip-if-exists, audio stripped, optional
    fps resample and aspect-preserving scale to ``resolution`` with
    centered padding."""
    if os.path.exists(dst_path):
        return  # skip-if-exists (ffmpeg's -n would EXIT 1 on an existing
        # file, which would abort a resumed sharded run under check=True)
    os.makedirs(os.path.dirname(dst_path) or ".", exist_ok=True)
    command = [
        ffmpeg_bin,
        "-n",  # belt-and-braces vs concurrent writers
        "-sws_flags", mode,
        "-i", src_path,
        "-an",
        "-threads", "10",
    ]
    if fps is not None:
        command += ["-r", str(fps)]
    if resolution is not None:
        assert pad is not None
        command += [
            "-vf",
            f"scale='if(gt(iw\\,ih)\\,{resolution}\\,-2)':'if(gt(iw\\,ih)\\,-2\\,{resolution})'"
            f",pad={resolution}:{resolution}:(ow-iw)/2:(oh-ih)/2:color='{pad}'",
        ]
    command += [dst_path]
    subprocess.run(command, check=True)


def reencode_video_cv2(
    src_path: str,
    dst_path: str,
    *,
    fps: Optional[int] = None,
    resolution: Optional[int] = None,
) -> None:
    """cv2 fallback with the same semantics (fps resample via wall-clock
    selection, letterbox to a square canvas). Skips if dst exists."""
    import cv2

    from .video import letterbox

    if os.path.exists(dst_path):
        return
    os.makedirs(os.path.dirname(dst_path) or ".", exist_ok=True)
    cap = cv2.VideoCapture(src_path)
    in_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    out_fps = fps if fps is not None else in_fps
    size = None
    writer = None
    cur, next_t = 0.0, 0.0
    tmp = dst_path + ".tmp.mp4"
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        if cur + 1e-9 >= next_t:
            if resolution is not None:
                frame = letterbox(frame, resolution)
            if writer is None:
                size = (frame.shape[1], frame.shape[0])
                writer = cv2.VideoWriter(
                    tmp, cv2.VideoWriter_fourcc(*"mp4v"), out_fps, size
                )
            writer.write(frame)
            next_t += 1.0 / out_fps
        cur += 1.0 / in_fps
    cap.release()
    if writer is None:
        raise ValueError(f"no frames decoded from {src_path}")
    writer.release()
    os.replace(tmp, dst_path)


def _have_ffmpeg(ffmpeg_bin: str) -> bool:
    try:
        subprocess.run(
            [ffmpeg_bin, "-version"], capture_output=True, check=True
        )
        return True
    except Exception:
        return False


def list_videos(src_root: str) -> List[str]:
    pather = pathlib.Path(src_root)
    return sorted(
        str(p) for p in pather.rglob("*")
        if p.is_file() and p.suffix.lower() in VIDEO_EXTS
    )


def dst_root_for(src_root: str, fps: Optional[int], resolution: Optional[int]) -> str:
    """Reference naming: ``videos`` -> ``videos_2fps_max384``
    (`data/utils.py:88-92`)."""
    dst = src_root.rstrip("/")
    if fps is not None:
        dst += f"_{fps}fps"
    if resolution is not None:
        dst += f"_max{resolution}"
    return dst


def sharded_reencode(
    src_root: str,
    *,
    fps: Optional[int] = None,
    resolution: Optional[int] = None,
    pad: str = "#000000",
    mode: str = "bicubic",
    num_shards: int = 1,
    shard_index: int = 0,
    ffmpeg_bin: str = "ffmpeg",
) -> str:
    """Re-encode every video under ``src_root`` (this shard's slice) into
    the derived dst root. Returns the dst root."""
    src_root = src_root.rstrip("/")
    dst_root = dst_root_for(src_root, fps, resolution)
    use_ffmpeg = _have_ffmpeg(ffmpeg_bin)
    for i, src in enumerate(list_videos(src_root)):
        if i % num_shards != shard_index:
            continue
        # relpath+join, NOT str.replace: a filename containing the root
        # string (e.g. videos/my_videos.mp4) must keep its basename
        dst = os.path.join(dst_root, os.path.relpath(src, src_root))
        if use_ffmpeg:
            ffmpeg_once(
                src, dst, fps=fps, resolution=resolution, pad=pad, mode=mode,
                ffmpeg_bin=ffmpeg_bin,
            )
        else:
            reencode_video_cv2(dst_path=dst, src_path=src, fps=fps, resolution=resolution)
    return dst_root


def _encode_batch_fn():
    """Module-level jitted SigLIP encode: params are ARGUMENTS (not
    closed over), so one compilation serves every video of a sharded
    extraction run — a per-video closure would re-trace + re-compile the
    whole tower for each file."""
    import jax

    from ..models.siglip import normalize_pixels, siglip_encode

    @partial(jax.jit, static_argnames=("vision_cfg", "dtype_name"))
    def encode(vision_params, vision_cfg, px_u8, dtype_name):
        import jax.numpy as jnp

        px = normalize_pixels(px_u8).astype(jnp.dtype(dtype_name))
        return siglip_encode(vision_params, vision_cfg, px)

    return encode


_ENCODE_BATCH = None


def extract_features(
    video_path: str,
    vision_params,
    vision_cfg,
    *,
    output_fps: float,
    resolution: int,
    batch_size: int = 32,
    max_num_frames: Optional[int] = None,
    dtype=None,
):
    """Decode one video and run the SigLIP tower → raw patch features
    (T, num_patches, vision_hidden) as a numpy array."""
    import jax.numpy as jnp

    from .video import decode_video

    global _ENCODE_BATCH
    if _ENCODE_BATCH is None:
        _ENCODE_BATCH = _encode_batch_fn()
    dtype_name = jnp.dtype(dtype or jnp.float32).name
    frames, fps, duration = decode_video(
        video_path, output_fps=output_fps, resolution=resolution,
        max_num_frames=max_num_frames,
    )

    chunks = []
    T = frames.shape[0]
    for i in range(0, T, batch_size):
        batch = frames[i : i + batch_size]
        n = batch.shape[0]
        if n < batch_size:  # pad to the single compiled batch shape
            batch = np.concatenate(
                [batch, np.zeros((batch_size - n, *batch.shape[1:]), batch.dtype)]
            )
        out = _ENCODE_BATCH(vision_params, vision_cfg, jnp.asarray(batch), dtype_name)
        chunks.append(np.asarray(out[:n], np.float32))
    feats = np.concatenate(chunks, axis=0)
    return feats, fps, duration


def sharded_extract(
    src_root: str,
    vision_params,
    vision_cfg,
    *,
    output_fps: float,
    resolution: int,
    embed_mark: str = "local",
    model_tag: str = "siglip",
    batch_size: int = 32,
    num_shards: int = 1,
    shard_index: int = 0,
    save_bf16: bool = False,
) -> str:
    """Feature-extract every video under ``src_root`` (this shard's
    slice) to ``<src_root>_<mark>_<model_tag>/<name>.npy`` + a sidecar
    ``.json`` with fps/duration (reference dst naming,
    `data/utils.py:104`). Returns the dst root."""
    src_root = src_root.rstrip("/")
    dst_root = f"{src_root}_{embed_mark.split('_')[-1]}_{model_tag.replace('/', '--')}"
    os.makedirs(dst_root, exist_ok=True)
    for i, src in enumerate(list_videos(src_root)):
        if i % num_shards != shard_index:
            continue
        rel = os.path.relpath(src, src_root)
        dst = os.path.join(dst_root, os.path.splitext(rel)[0] + ".npy")
        if os.path.exists(dst):
            continue
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        feats, fps, duration = extract_features(
            src, vision_params, vision_cfg,
            output_fps=output_fps, resolution=resolution, batch_size=batch_size,
        )
        if save_bf16:  # stored compact; loaded back as f32/bf16 by jnp
            import ml_dtypes

            feats = feats.astype(ml_dtypes.bfloat16)
        np.save(dst + ".tmp.npy", feats)
        os.replace(dst + ".tmp.npy", dst)
        with open(os.path.splitext(dst)[0] + ".json", "w") as f:
            json.dump({"fps": fps, "duration": duration, "src": rel}, f)
    return dst_root


def load_features(path: str) -> np.ndarray:
    """Load a pre-extracted feature file (f32 or bf16-packed)."""
    feats = np.load(path)
    if feats.dtype != np.float32:
        feats = feats.astype(np.float32)
    return feats


def _resolve_cluster_shard(num_shards: int, shard_index: int):
    """Auto-shard from the cluster scheduler when the CLI is launched as
    an array/distributed job with default shard args (the reference's
    submitit SLURM sharding, `data/utils.py:81-117`, without the
    submitit dependency): SLURM array/step env vars first, then a TPU
    pod's `jax.process_index` when JAX is already distributed-initialized.
    Explicit --num_shards/--shard_index always win."""
    if num_shards != 1 or shard_index != 0:
        return num_shards, shard_index
    env = os.environ
    if env.get("SLURM_ARRAY_TASK_COUNT"):
        n = int(env["SLURM_ARRAY_TASK_COUNT"])
        i = int(env.get("SLURM_ARRAY_TASK_ID", 0)) - int(
            env.get("SLURM_ARRAY_TASK_MIN", 0)
        )
        if n > 1:
            print(f"[preprocess] SLURM array sharding: {i}/{n}")
            return n, i
    if env.get("SLURM_NTASKS"):
        n = int(env["SLURM_NTASKS"])
        i = int(env.get("SLURM_PROCID", 0))
        if n > 1:
            print(f"[preprocess] SLURM task sharding: {i}/{n}")
            return n, i
    # TPU pod: a multi-process jax.distributed launch shards by process
    # index. Only consult jax if it is already imported — preprocessing
    # is host-side work and must not initialize a TPU backend itself.
    jax_mod = sys.modules.get("jax")
    if jax_mod is not None:
        try:
            n = jax_mod.process_count()
            i = jax_mod.process_index()
        except Exception:
            n, i = 1, 0
        if n > 1:
            print(f"[preprocess] jax.distributed sharding: {i}/{n}")
            return n, i
    return num_shards, shard_index


def main(argv=None):
    p = argparse.ArgumentParser(description="MMDuet-TPU offline preprocessing")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("reencode", help="fps/resolution re-encode a video tree")
    r.add_argument("--src_root", required=True)
    r.add_argument("--fps", type=int, default=None)
    r.add_argument("--resolution", type=int, default=None)
    r.add_argument("--pad", default="#000000")
    r.add_argument("--mode", default="bicubic")
    r.add_argument("--num_shards", type=int, default=1)
    r.add_argument("--shard_index", type=int, default=0)
    r.add_argument("--ffmpeg_bin", default="ffmpeg")

    e = sub.add_parser("encode", help="pre-extract SigLIP features")
    e.add_argument("--src_root", required=True)
    e.add_argument("--checkpoint", required=True,
                   help="converted checkpoint dir (for the vision tower)")
    e.add_argument("--fps", type=float, required=True)
    e.add_argument("--resolution", type=int, default=None,
                   help="default: the checkpoint's frame_resolution")
    e.add_argument("--embed_mark", default="local")
    e.add_argument("--batch_size", type=int, default=32)
    e.add_argument("--num_shards", type=int, default=1)
    e.add_argument("--shard_index", type=int, default=0)
    e.add_argument("--bf16", action="store_true")

    args = p.parse_args(argv)
    args.num_shards, args.shard_index = _resolve_cluster_shard(
        args.num_shards, args.shard_index
    )
    if args.cmd == "reencode":
        dst = sharded_reencode(
            args.src_root, fps=args.fps, resolution=args.resolution,
            pad=args.pad, mode=args.mode, num_shards=args.num_shards,
            shard_index=args.shard_index, ffmpeg_bin=args.ffmpeg_bin,
        )
    else:
        from ..models.io import load_checkpoint

        cfg, params, _ = load_checkpoint(args.checkpoint)
        resolution = args.resolution or cfg.frame_resolution
        dst = sharded_extract(
            args.src_root, params["vision"], cfg.vision,
            output_fps=args.fps, resolution=resolution,
            embed_mark=args.embed_mark, model_tag="siglip",
            batch_size=args.batch_size, num_shards=args.num_shards,
            shard_index=args.shard_index, save_bf16=args.bf16,
        )
    print(f"done -> {dst}")


if __name__ == "__main__":
    main()
