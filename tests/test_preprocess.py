"""Offline preprocessing round-trip: mp4 -> re-encode -> features ->
engine scores identical to the raw-pixels path (VERDICT round-1 task 7)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

from mmduet_tpu.config import TestArgs as InferArgs, tiny_config
from mmduet_tpu.data.preprocess import (
    dst_root_for,
    extract_features,
    list_videos,
    load_features,
    sharded_extract,
    sharded_reencode,
)
from mmduet_tpu.data.video import decode_video
from mmduet_tpu.infer.engine import LiveInferEngine
from mmduet_tpu.models import init_mmduet_params
from mmduet_tpu.stream import CharTokenizer

CFG = tiny_config().replace(v_placeholder_id=511, eos_token_id=257)
PARAMS = init_mmduet_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def video_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("pre") / "videos"
    sub = root / "subdir"
    sub.mkdir(parents=True)
    r = np.random.RandomState(0)
    for path in (root / "a.mp4", sub / "b.mp4"):
        writer = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 40)
        )
        for _ in range(30):  # 3 s @ 10 fps
            writer.write(r.randint(0, 255, (40, 48, 3), np.uint8))
        writer.release()
    return str(root)


class TestReencode:
    def test_sharded_reencode_cv2_fallback(self, video_tree):
        dst_root = sharded_reencode(
            video_tree, fps=2, resolution=32, ffmpeg_bin="definitely-missing-ffmpeg"
        )
        assert dst_root == dst_root_for(video_tree, 2, 32)
        outs = list_videos(dst_root)
        assert len(outs) == 2 and any("subdir" in o for o in outs)
        frames, fps, dur = decode_video(outs[0], output_fps=2, resolution=32)
        assert frames.shape[1:] == (32, 32, 3)
        assert abs(fps - 2) < 1e-6
        # 3s source at 2 fps -> ~6 frames survived the re-encode
        assert 4 <= len(frames) <= 7

    def test_shard_slicing_disjoint(self, video_tree, tmp_path):
        import shutil

        root = str(tmp_path / "videos")
        shutil.copytree(video_tree, root)
        d0 = sharded_reencode(root, fps=2, num_shards=2, shard_index=0,
                              ffmpeg_bin="definitely-missing-ffmpeg")
        n0 = len(list_videos(d0))
        sharded_reencode(root, fps=2, num_shards=2, shard_index=1,
                         ffmpeg_bin="definitely-missing-ffmpeg")
        n_all = len(list_videos(d0))
        assert n0 == 1 and n_all == 2


class TestFeatureExtraction:
    def test_roundtrip_scores_match_pixel_path(self, video_tree):
        """Engine scores from pre-extracted features == scores from raw
        pixels of the same video (the reference's `.pt` feature contract:
        `input_frame_embeds` consumers see identical values)."""
        src = list_videos(video_tree)[0]
        feats, fps, dur = extract_features(
            src, PARAMS["vision"], CFG.vision,
            output_fps=2.0, resolution=CFG.frame_resolution, batch_size=4,
        )
        assert feats.shape[1:] == (CFG.vision.num_patches, CFG.vision.hidden_size)

        tok = CharTokenizer(frame_num_tokens=CFG.frame_num_tokens)
        args = InferArgs(stream_end_prob_threshold=1.0, grounding_mode=True)

        eng_px = LiveInferEngine(PARAMS, CFG, tok, args, block_frames=4)
        eng_px.set_fps(2.0)
        frames, _, _ = decode_video(
            src, output_fps=2.0, resolution=CFG.frame_resolution
        )
        eng_px.input_video_stream(frames)
        eng_px.inference()
        px_scores = [d["informative_score"] for d in eng_px.debug_data_list]

        eng_ft = LiveInferEngine(PARAMS, CFG, tok, args, block_frames=4)
        eng_ft.set_fps(2.0)
        eng_ft.input_vision_feats(feats)
        eng_ft.inference()
        ft_scores = [d["informative_score"] for d in eng_ft.debug_data_list]

        assert len(px_scores) == len(ft_scores) == len(frames)
        np.testing.assert_allclose(px_scores, ft_scores, atol=1e-4)

    def test_sharded_extract_writes_npy_and_meta(self, video_tree):
        dst = sharded_extract(
            video_tree, PARAMS["vision"], CFG.vision,
            output_fps=2.0, resolution=32, model_tag="tiny", batch_size=4,
        )
        assert dst.endswith("_local_tiny")
        npys = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(dst) for f in fs if f.endswith(".npy")
        )
        assert len(npys) == 2
        feats = load_features(npys[0])
        assert feats.dtype == np.float32
        assert feats.shape[1:] == (CFG.vision.num_patches, CFG.vision.hidden_size)
        meta = os.path.splitext(npys[0])[0] + ".json"
        assert os.path.exists(meta)


def test_slurm_env_sharding(monkeypatch):
    """Default shard args + SLURM array env -> auto-sharded; explicit
    args always win (reference submitit parity, data/utils.py:81-117)."""
    from mmduet_tpu.data.preprocess import _resolve_cluster_shard

    monkeypatch.setenv("SLURM_ARRAY_TASK_COUNT", "4")
    monkeypatch.setenv("SLURM_ARRAY_TASK_ID", "2")
    monkeypatch.setenv("SLURM_ARRAY_TASK_MIN", "0")
    assert _resolve_cluster_shard(1, 0) == (4, 2)
    assert _resolve_cluster_shard(8, 3) == (8, 3)  # explicit wins
    monkeypatch.delenv("SLURM_ARRAY_TASK_COUNT")
    monkeypatch.setenv("SLURM_NTASKS", "3")
    monkeypatch.setenv("SLURM_PROCID", "1")
    assert _resolve_cluster_shard(1, 0) == (3, 1)
    monkeypatch.delenv("SLURM_NTASKS")
    assert _resolve_cluster_shard(1, 0) == (1, 0)
