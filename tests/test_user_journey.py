"""The full reference-user journey at tiny scale with REAL structure:

HF-format checkpoint dir (safetensors + config + BPE tokenizer files)
  -> conversion CLI -> framework checkpoint
  -> training CLI (grounding dataset over real mp4s, pixel path)
  -> eval CLI on the TRAINED output (Charades protocol, grounding mode)
  -> grounding metrics.

This is the pipeline a user of the reference runs with the real 7B
weights; everything except the weights is exercised for real (BPE
offsets, <image>-id ownership by the tokenizer, collator, pixels-path
training, checkpoint hand-off between CLIs, JSONL schema, metric stack).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")
cv2 = pytest.importorskip("cv2")

from test_bpe_tokenizer import build_qwen2_style_tokenizer


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    """Tiny HF-format model dir: qwen2 + nested llava vision tower +
    projector + duet heads + a real byte-level-BPE tokenizer."""
    from safetensors.numpy import save_file
    from transformers import (
        Qwen2Config as HFQ,
        Qwen2ForCausalLM,
        SiglipVisionConfig,
        SiglipVisionModel,
    )

    d = tmp_path_factory.mktemp("hf")
    tok = build_qwen2_style_tokenizer()
    tok.save_pretrained(str(d))
    vocab = len(tok)

    torch.manual_seed(0)
    m = Qwen2ForCausalLM(HFQ(
        vocab_size=vocab + 8,  # headroom rows like the real ckpt
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        rope_theta=10000.0, attn_implementation="eager",
    )).eval()
    v = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        attn_implementation="eager",
    )).eval()
    sd = {k: t.numpy() for k, t in m.state_dict().items()}
    for k, t in v.state_dict().items():
        sd[f"model.vision_tower.vision_tower.{k}"] = t.numpy()
    h, vh = 64, 32
    r = np.random.RandomState(1)
    sd["model.mm_projector.0.weight"] = r.randn(h, vh).astype(np.float32) * 0.1
    sd["model.mm_projector.0.bias"] = np.zeros(h, np.float32)
    sd["model.mm_projector.2.weight"] = r.randn(h, h).astype(np.float32) * 0.1
    sd["model.mm_projector.2.bias"] = np.zeros(h, np.float32)
    sd["informative_head.weight"] = r.randn(2, h).astype(np.float32) * 0.1
    sd["relevance_head.weight"] = r.randn(2, h).astype(np.float32) * 0.1
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "vocab_size": vocab + 8, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16, "rope_theta": 10000.0,
        "rms_norm_eps": 1e-6, "eos_token_id": tok.eos_token_id,
        "video_pooling_stride": 1,  # 2x2 patch grid -> 4 tokens/frame
        "vision_config": {
            "image_size": 28, "patch_size": 14, "hidden_size": 32,
            "intermediate_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 2,
        },
    }))
    return str(d)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """Grounding dataset: 2 real mp4s + annos + eval file."""
    d = tmp_path_factory.mktemp("data")
    vids = d / "videos"
    vids.mkdir()
    r = np.random.RandomState(0)
    for name in ("a.mp4", "b.mp4"):
        w = cv2.VideoWriter(str(vids / name), cv2.VideoWriter_fourcc(*"mp4v"),
                            10, (36, 28))
        for _ in range(40):  # 4 s
            w.write(r.randint(0, 255, (28, 36, 3), np.uint8))
        w.release()
    train_anno = [
        {"video_uid": "a.mp4", "query": "a thing moves", "timestamps": [[1.0, 3.0]]},
        {"video_uid": "b.mp4", "query": "something appears", "timestamps": [[0.0, 2.0]]},
        {"video_uid": "a.mp4", "query": "motion happens", "timestamps": [[2.0, 4.0]]},
        {"video_uid": "b.mp4", "query": "a shape shows up", "timestamps": [[1.0, 3.0]]},
    ]
    (d / "train.json").write_text(json.dumps(train_anno))
    (d / "dataset_config.json").write_text(json.dumps([{
        "dataset_cls": "GroundingStreamDataset",
        "video_root": str(vids),
        "anno_file": str(d / "train.json"),
        "metadata_path": str(d / "videos_metadata.json"),
    }]))
    eval_anno = [
        {"question_id": "q0", "video": "a.mp4",
         "conversation": [{"role": "user", "content": "a thing moves", "time": 0}],
         "timestamps": [[1.0, 3.0]]},
    ]
    (d / "charades.json").write_text(json.dumps(eval_anno))
    return str(d)


def test_full_pipeline(hf_dir, data_dir, tmp_path):
    from mmduet_tpu.models.convert import main as convert_main

    ckpt = str(tmp_path / "ckpt")
    convert_main(["--hf_dir", hf_dir, "--output", ckpt, "--dtype", "float32"])
    assert os.path.exists(os.path.join(ckpt, "tokenizer.json"))

    # --- training: 1 optimizer step over the grounding data, pixel path
    from mmduet_tpu.train.loop import main as train_main

    out = str(tmp_path / "run")
    train_main([
        "--checkpoint", ckpt,
        "--dataset_config", os.path.join(data_dir, "dataset_config.json"),
        "--output_dir", out,
        "--per_device_batch_size", "1", "--grad_accum_steps", "2",
        "--mesh_data", "2",  # 2-way DP on the virtual CPU mesh
        "--num_epochs", "1", "--frame_fps", "1", "--max_num_frames", "6",
        "--seq_len", "320", "--lora_r", "2", "--save_steps", "0",
        "--logging_steps", "1", "--dataloader_num_workers", "2",
    ])
    final = os.path.join(out, "final")
    assert os.path.exists(os.path.join(final, "config.json"))
    assert os.path.exists(os.path.join(final, "tokenizer.json"))
    log = [json.loads(l) for l in open(os.path.join(out, "log.jsonl"))]
    assert log and np.isfinite(log[-1]["loss"])

    # --- eval on the TRAINED checkpoint: Charades grounding protocol
    from mmduet_tpu.eval.inference import main as infer_main

    pred = str(tmp_path / "pred.jsonl")
    infer_main([
        "--checkpoint", final,
        "--grounding_mode", "true", "--stream_end_prob_threshold", "1",
        "--input_dir", os.path.join(data_dir, "videos"),
        "--test_fname", os.path.join(data_dir, "charades.json"),
        "--frame_fps", "1", "--max_num_frames", "6",
        "--output_fname", pred, "--no_prefetch",
    ])
    rows = [json.loads(l) for l in open(pred)]
    assert len(rows) == 1
    assert len(rows[0]["debug_data"]) >= 4  # one score per streamed frame
    assert all(0 <= d["relevance_score"] <= 1 for d in rows[0]["debug_data"])

    # --- metrics
    from mmduet_tpu.eval.evaluate import main as eval_main

    eval_main([
        "--func", "grounding",
        "--pred_file", pred,
        "--gold_file", os.path.join(data_dir, "charades.json"),
        "--output_file", str(tmp_path / "metrics.json"),
    ])
    results = json.load(open(tmp_path / "metrics.json"))
    assert any(r["threshold"] == "oracle" for r in results)


def test_real_checkpoint_runbook_parity_gate(hf_dir, tmp_path):
    """docs/REAL_CHECKPOINT.md step 2 dry-run: convert the HF dir, then
    the parity gate must PASS on the tiny checkpoint (logits, score
    probs, vision features vs the HF source)."""
    import sys

    from mmduet_tpu.models.convert import main as convert_main

    ckpt = str(tmp_path / "ckpt")
    convert_main(["--hf_dir", hf_dir, "--output", ckpt, "--dtype", "float32"])

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ))
    import verify_checkpoint_parity

    rc = verify_checkpoint_parity.main([
        "--hf_dir", hf_dir, "--checkpoint", ckpt,
        "--n_prompts", "3", "--seq_len", "24", "--atol", "0.01",
    ])
    assert rc == 0


def test_convert_quantize_int4(hf_dir, tmp_path):
    """`convert --quantize int4` writes grouped-int4 leaves that load and
    serve directly (first CLI coverage of the quantize flag)."""
    import jax.numpy as jnp

    from mmduet_tpu.models.convert import main as convert_main
    from mmduet_tpu.models.io import load_checkpoint

    ckpt = str(tmp_path / "ckpt4")
    convert_main(["--hf_dir", hf_dir, "--output", ckpt,
                  "--quantize", "int4"])
    cfg, params, _ = load_checkpoint(ckpt)
    qw = params["decoder"]["layers"]["q_proj"]["qw4"]
    assert qw.dtype == jnp.int8 and qw.ndim == 4  # (L, G, g/2, out) packed
    assert params["lm_head"]["qw4"].ndim == 3  # (G, g/2, V)
    assert params["decoder"]["embed"]["qw4"].ndim == 3  # (V, G, g/2)


def test_convert_lora_dir_folds_peft_scale(hf_dir, tmp_path):
    """`convert --lora_dir`: the PEFT adapter's alpha/r is read from
    adapter_config.json and folded into the saved b factors, so the
    serving CLI's lora_scale=1.0 contract applies the trained delta at
    full strength (r5 fix: nothing recorded the scale before, so CLI
    adapter serving was a silent no-op)."""
    import json

    import jax.numpy as jnp
    import numpy as np
    from safetensors.numpy import save_file

    from mmduet_tpu.models.convert import main as convert_main
    from mmduet_tpu.models.io import load_checkpoint

    r, alpha, h = 4, 16, 64
    rng = np.random.RandomState(3)
    sd = {}
    for i in range(2):  # tiny fixture: 2 layers
        for proj, dout in (("self_attn.q_proj", 64), ("self_attn.v_proj", 32)):
            sd[f"base_model.model.model.layers.{i}.{proj}.lora_A.weight"] = \
                rng.randn(r, h).astype(np.float32)
            sd[f"base_model.model.model.layers.{i}.{proj}.lora_B.weight"] = \
                rng.randn(dout, r).astype(np.float32)
    adir = tmp_path / "adapter"
    adir.mkdir()
    save_file(sd, str(adir / "adapter_model.safetensors"))
    (adir / "adapter_config.json").write_text(
        json.dumps({"r": r, "lora_alpha": alpha, "peft_type": "LORA"})
    )

    ckpt = str(tmp_path / "ckpt_lora")
    convert_main(["--hf_dir", hf_dir, "--lora_dir", str(adir),
                  "--output", ckpt, "--dtype", "float32"])
    cfg, params, lora = load_checkpoint(ckpt)
    assert lora is not None and set(lora) == {"q_proj", "v_proj"}
    # b carries alpha/r = 4.0 baked in; a is raw
    rawA = sd["base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"]
    rawB = sd["base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight"]
    np.testing.assert_allclose(
        np.asarray(lora["q_proj"]["a"][0]), rawA.T, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(lora["q_proj"]["b"][0]), rawB.T * (alpha / r), atol=1e-5
    )

    # a missing adapter_config must fail loudly, not serve unscaled
    (adir / "adapter_config.json").unlink()
    with pytest.raises(FileNotFoundError, match="adapter_config"):
        convert_main(["--hf_dir", hf_dir, "--lora_dir", str(adir),
                      "--output", str(tmp_path / "ckpt_bad")])
