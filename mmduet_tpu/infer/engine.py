"""LiveInferEngine — the streaming duet inference runtime on TPU.

TPU-native rebuild of the reference `LiveInferForBenchmark`
(`test/inference.py:20-313`) and `fast_greedy_generate`
(`models/modeling_live.py:51-77`):

- every forward runs at one of a few **static bucket shapes** against the
  preallocated KV cache (no recompile storms as the stream grows);
- **generation is a device-side `lax.while_loop`** — one kernel launch per
  response instead of the reference's ≤200 python-loop forwards, with
  repetition penalty and the cross-turn penalized-token set carried as a
  device bitmask;
- ``remove_assistant_turns`` is a **cursor rewind** (free) instead of the
  reference's cache-object swap (`inference.py:265-269`);
- frame embeddings stay **on device** end to end (the reference round-trips
  every frame's embedding through CPU, `inference.py:212`);
- all three threshold policies are active: single-frame prob, sum-reset,
  and the z-score adaptive threshold (which the reference parses but only
  supports in dead code — SURVEY.md §2.10(4));
- a per-frame latency recorder (the tracing hook the reference lacks,
  SURVEY.md §5.1).

Protocol-parity quirks faithfully kept (they define the published numbers):
the first stream chunk is ``[system tokens] + frames`` with no stream
header, and after a kept assistant turn the next frame is joined with
``[last generated token] + stream header`` (`inference.py:229-234`).
"""

from __future__ import annotations

import collections
import time
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MMDuetConfig, TestArgs
from ..models import mmduet
from ..models.qwen2 import KVCache, embed_tokens, init_kv_cache
from .state import (
    DEFAULT_BUCKETS,
    StreamState,
    ThresholdPolicy,
    build_prompt_fragments,
    frame_joiner_ids,
    encode_uploaded,
    pad_chunk,
    pick_bucket,
    staged_visual_encode,
    upload_pixels,
    validate_threshold_args,
)

VISION_BATCH = 32


class LiveInferEngine:
    """Streaming inference over one video conversation at a time."""

    def __init__(
        self,
        params,
        cfg: MMDuetConfig,
        tokenizer,
        args: TestArgs,
        lora=None,
        lora_scale: float = 0.0,
        kv_cache_size: Optional[int] = None,
        dtype=None,
        block_frames: Optional[int] = None,
        mesh=None,
        kv_cache_quant: Optional[str] = None,  # "int8": per-token int8
        # KV cache ({"qw","qs"} leaves, `qwen2.init_kv_cache`) — halves
        # cache HBM footprint and decode bandwidth; scores drift within
        # the bound pinned by tests/test_kv_quant.py
    ):
        """``mesh``: a (data, model) `jax.sharding.Mesh` for
        tensor-parallel serving — shard ``params`` with
        `parallel.shard_params(params, mesh)` first (Megatron-layout TP
        over the ``model`` axis; replicate over ``data``). The KV cache
        is sharded on its kv-head dim and XLA inserts one psum per
        attention+MLP block. TP serving is what lets the FULL model
        (decoder + 152k lm_head + SigLIP) stay resident on a v5e-8 when
        a single chip's HBM cannot hold it. The Pallas attention kernel
        runs under `shard_map` when the head counts divide the model
        axis (`ops.attention.flash_decode_attention_sharded`); the jnp
        GSPMD path is the fallback."""
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.lora = lora
        self.lora_scale = lora_scale
        self.mesh = mesh
        model_n = mesh.shape.get("model", 1) if mesh is not None else 1
        # Under a mesh, every chunk entering a jitted serving fn is first
        # pinned to ONE canonical (replicated) sharding: jit caches key on
        # input shardings, and chunk producers differ (eager embed_tokens
        # over the vocab-sharded table, the jitted vision encode, host
        # arrays from input_frame_embeds) — without normalization each
        # producer would compile its own entry and prewarm() could never
        # cover them. Chunks are <=2 MB; replication is noise.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._act_sharding = NamedSharding(mesh, PartitionSpec())
        else:
            self._act_sharding = None
        # None = auto (single-chip TPU picks the pallas kernel). Under a
        # TP mesh the kernel runs via shard_map when the head counts
        # divide the model axis (GSPMD cannot partition a pallas_call);
        # otherwise fall back to the GSPMD-partitionable jnp attention.
        self._shard_ctx = None
        if model_n > 1:
            from ..ops.attention import ShardCtx, shard_ctx_ok

            ctx = ShardCtx(mesh, lane_axis=None, head_axis="model")
            if shard_ctx_ok(
                ctx, cfg.text.num_heads, cfg.text.num_kv_heads, 1
            ):
                self._shard_ctx = ctx
        # auto-flash only off-mesh (or a degenerate 1-device mesh) or via
        # shard_map: a mesh with model=1 but data>1 still compiles the
        # serving fns through GSPMD, which cannot partition a pallas_call
        n_mesh_devices = mesh.size if mesh is not None else 1
        self._use_flash = (
            None if (n_mesh_devices == 1 or self._shard_ctx is not None)
            else False
        )
        # activation dtype: from a norm leaf (robust to int8-quantized
        # weight leaves in the tree)
        self.dtype = dtype or params["decoder"]["final_norm"].dtype
        self.kv_cache_quant = kv_cache_quant

        validate_threshold_args(args)
        self.args = args
        self.score_heads = args.score_heads.split(",")
        self.grounding_mode = args.grounding_mode
        # one-deep block pipelining in grounding mode (set False to force
        # the sequential loop — used by the equivalence test)
        self.pipeline_grounding = True

        # pre-tokenized incremental fragments (reference inference.py:61-63)
        self._start_ids, self._stream_open_ids, self._gen_prompt_ids = (
            build_prompt_fragments(tokenizer, args.system_prompt)
        )

        cache_size = kv_cache_size or (
            args.max_num_frames * cfg.frame_num_tokens + 4096
        )
        # round to the pallas attention kernel's KV block size
        self._cache_size = -(-cache_size // 2048) * 2048
        self.set_fps(args.frame_fps)

        # ---- jitted device functions ----
        use_flash = self._use_flash
        shard_ctx = self._shard_ctx
        if mesh is not None:
            from ..parallel.sharding import kv_cache_sharding

            kv_sh = kv_cache_sharding(mesh, cfg.text.num_kv_heads)
        else:
            kv_sh = None

        def _pin_kv(cache: KVCache) -> KVCache:
            """Pin cache outputs to the canonical (reset) sharding so the
            cache's sharding never drifts across the serving fns — with
            `_norm_act` on inputs this makes every jit cache entry
            reachable by `prewarm()` under TP."""
            if kv_sh is None:
                return cache
            return KVCache(
                jax.lax.with_sharding_constraint(cache.k, kv_sh),
                jax.lax.with_sharding_constraint(cache.v, kv_sh),
            )

        def _step(params, lora, embeds, k, v, cache_len, t_real, compute_lm):
            out = mmduet.step_forward(
                params, cfg, embeds[None], KVCache(k, v), cache_len, t_real,
                lora=lora, lora_scale=lora_scale,
                compute_lm_logits=compute_lm, use_flash=use_flash,
                shard_ctx=shard_ctx,
            )
            out = out._replace(kv_cache=_pin_kv(out.kv_cache))
            # both score probs stacked into ONE tiny array: the per-frame
            # host sync then pays a single device->host round trip (on a
            # tunneled chip a second scalar fetch costs a full extra RTT)
            probs = jnp.stack([out.informative_prob[0], out.relevance_prob[0]])
            return (
                probs,
                out.last_logits[0] if compute_lm else None,
                out.kv_cache.k,
                out.kv_cache.v,
            )

        self._step = jax.jit(
            _step, static_argnames=("compute_lm",), donate_argnums=(3, 4)
        )

        # Block size: frames per fused chunk forward. Grounding mode never
        # generates, so a trigger never rolls frames back and a big block
        # is a pure win; generation workloads keep blocks moderate so a
        # mid-block trigger discards little work.
        if block_frames is None:
            block_frames = 32 if args.grounding_mode else 8
        self.block_frames = max(1, block_frames)

        def _frames_block(params, lora, frames, k, v, cache_len):
            inf, rel, cache = mmduet.frames_block_forward(
                params, cfg, frames, KVCache(k, v), cache_len,
                lora=lora, lora_scale=lora_scale, use_flash=use_flash,
                shard_ctx=shard_ctx,
            )
            cache = _pin_kv(cache)
            # both score vectors stacked: the host reads ONE (2, K) array
            # (a second fetch costs a full extra tunnel round trip)
            return jnp.stack([inf, rel]), cache.k, cache.v

        self._frames_block = jax.jit(_frames_block, donate_argnums=(3, 4))

        max_new = args.max_new_tokens
        rep = args.repetition_penalty
        eos_id = tokenizer.eos_token_id
        act_sh = self._act_sharding

        def _generate(params, lora, embeds, k, v, cache_len, t_real, pen_mask):
            """Prefill the generation prompt then greedy-decode on device.

            `mmduet.decode_loop` carries only a (L, 1, kh, max_new-1, hd)
            scratch through the decode while-loop — the big cache is a
            loop invariant (carrying it made XLA double-buffer ~GBs of
            HBM at protocol-scale cache sizes)."""
            packed, cache, pen_out = mmduet.decode_loop(
                params, cfg, embeds[None], KVCache(k, v), cache_len, t_real,
                pen_mask[None], max_new=max_new, eos_id=eos_id, rep=rep,
                lora=lora, lora_scale=lora_scale, use_flash=use_flash,
                shard_ctx=shard_ctx,
            )
            cache = _pin_kv(cache)
            if act_sh is not None:
                # pin the mask output like the KV cache: an unpinned
                # GSPMD-chosen sharding would miss the jit cache on the
                # NEXT generation (sharding drift = silent recompile)
                pen_out = jax.lax.with_sharding_constraint(pen_out, act_sh)
            # tokens + n + cursor packed into ONE (max_new+2,) array — a
            # single host fetch per generation instead of two round trips
            return packed[0], cache.k, cache.v, pen_out[0]

        self._generate = jax.jit(_generate, donate_argnums=(3, 4))

        # Under a mesh the (replicated) vision program goes through
        # GSPMD, which cannot partition a pallas_call — force the jnp
        # attention there; single-chip keeps the fused kernel (auto).
        _vflash = False if mesh is not None else None

        @jax.jit
        def _visual(params, pixels_u8):
            px = mmduet.normalize_pixels(cfg, pixels_u8).astype(self.dtype)
            return mmduet.visual_embed(params, cfg, px,
                                       vision_use_flash=_vflash)

        self._visual = _visual
        # live-feed appender: donated buffer makes each append an
        # in-place O(chunk) write (eager .at[].set would copy the whole
        # buffer; repeated concatenate would be quadratic over a session)
        self._append_upd = jax.jit(
            lambda buf, new, i: jax.lax.dynamic_update_slice(
                buf, new, (i, 0, 0)
            ),
            donate_argnums=(0,),
        )
        self.reset()

    # ------------------------------------------------------------------
    # session control
    # ------------------------------------------------------------------

    def set_fps(self, fps: Optional[float] = None, frame_interval: Optional[float] = None):
        assert (fps is None) != (frame_interval is None)
        if fps is not None and fps <= 0:
            # 'auto' sentinel (--frame_fps 0): the driver sets the real
            # per-sample rate later via set_fps(sample.fps); placeholder
            # until then instead of dividing by zero at engine build
            fps = 1.0
        self.frame_fps = fps if fps is not None else 1.0 / frame_interval
        self.frame_interval = 1.0 / self.frame_fps

    def reset(self):
        cache = init_kv_cache(
            self.cfg.text, 1, self._cache_size, self.dtype,
            quant=self.kv_cache_quant,
        )
        if self.mesh is not None:
            from ..parallel.sharding import kv_cache_sharding

            # one sharding broadcast over the k/v pytrees: the spec has
            # no trailing Nones, so it applies to both the 5D values and
            # (int8 cache) the 4D scale leaves
            sh = kv_cache_sharding(self.mesh, self.cfg.text.num_kv_heads)
            cache = KVCache(
                jax.device_put(cache.k, sh), jax.device_put(cache.v, sh)
            )
        self.state = StreamState(cache)
        self.query_queue = collections.deque()
        self.frame_embeds = None  # (T, frame_tokens, H) device array
        self.frame_times: List[float] = []
        self._next_frame = 0
        self.video_time = 0.0
        self.frame_idx = 0
        self.last_role = "system"
        self._pending_ids: List[int] = []
        self.debug_data_list: List[Dict[str, Any]] = []
        self.frame_latencies_ms: List[float] = []
        self._policy = ThresholdPolicy(self.args)
        self._pen_mask = jnp.zeros((self.cfg.text.vocab_size,), bool)
        if self._act_sharding is not None:
            # canonical input sharding (jit keys on it; see _generate)
            self._pen_mask = jax.device_put(self._pen_mask,
                                            self._act_sharding)

    def prewarm(
        self,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        block: bool = True,
        generate: bool = True,
        vision: bool = False,
    ) -> None:
        """Compile every hot serving shape BEFORE the first live session.

        An un-warmed shape hit mid-stream stalls the session for a full
        XLA compile (measured ~8 s for one prefill bucket of the 7B int8
        model through a tunneled chip). Production serving calls this
        once at startup: each prefill bucket (query turns and frame
        chunks bucket to these widths, `state.DEFAULT_BUCKETS`), the
        fused frame block, the greedy-decode loop, and optionally the
        batched vision encode. Resets the engine afterwards.

        Under tensor-parallel serving (``mesh`` set) this works because
        every jitted call pins its chunk input to ONE canonical sharding
        (`_norm_act`) and pins its KV-cache output back to the reset
        sharding (`_pin_kv`), so synthetic warm inputs hit exactly the
        jit cache entries the live stream will — pinned by
        `tests/test_tp_inference.py::TestTPPrewarm`."""
        H = self.cfg.text.hidden_size
        ft = self.cfg.frame_num_tokens
        zero = lambda n: jnp.zeros((n, H), self.dtype)  # noqa: E731
        for b in buckets:
            if self.state.capacity < b:
                continue
            self.state.cursor = 0
            self._feed(zero(b))
        if block and self.block_frames >= 2:
            self.state.cursor = 0
            frames = self._norm_act(
                jnp.zeros((self.block_frames, ft, H), self.dtype)
            )
            _, k, v = self._frames_block(
                self.params, self.lora, frames,
                self.state.kv_cache.k, self.state.kv_cache.v, jnp.int32(0),
            )
            # the call donates the cache buffers — rebind the new ones
            self.state.kv_cache = KVCache(k, v)
        if generate:
            self.state.cursor = 0
            self._generate_response()
        if vision:
            px = jnp.zeros(
                (VISION_BATCH, self.cfg.frame_resolution,
                 self.cfg.frame_resolution, 3), jnp.uint8,
            )
            jax.block_until_ready(self._visual(self.params, px))
        self.reset()

    # ------------------------------------------------------------------
    # inputs
    # ------------------------------------------------------------------

    def _encode_pixels(self, video_frames) -> jnp.ndarray:
        """Batched vision encode of uint8 (T,H,W,3) pixels -> (T, ft, H)
        with overlapped uploads (`state.staged_visual_encode`)."""
        return staged_visual_encode(
            self._visual, self.params, video_frames, VISION_BATCH
        )

    def input_video_stream(self, video_frames) -> None:
        """Encode all frames on device, batched (reference batches 32 on GPU
        then copies each frame to CPU, `inference.py:196-214`; we keep the
        embeddings resident in HBM)."""
        embeds = self._encode_pixels(video_frames)
        self.frame_embeds = embeds
        self.frame_times = [i / self.frame_fps for i in range(len(embeds))]
        self._next_frame = 0

    def input_frame_embeds(self, frame_embeds: jnp.ndarray) -> None:
        """Post-projector frame embeddings (T, frame_tokens, H)."""
        self.frame_embeds = jnp.asarray(frame_embeds, self.dtype)
        self.frame_times = [i / self.frame_fps for i in range(len(frame_embeds))]
        self._next_frame = 0

    def append_frames(self, video_frames) -> None:
        """Incrementally add frames MID-SESSION — the live-source path
        (camera / RTSP / chunked upload), which the reference cannot do
        (its driver requires the whole video up front,
        `test/inference.py:196-214`). Encodes the new pixels and appends
        to the resident embedding buffer; a subsequent `inference()` call
        continues the same stream (same cache, clocks, policy state), so
        chunked feeding is identical to one-shot feeding (pinned by
        `tests/test_infer_engine.py::TestAppendFrames`)."""
        self.append_frame_embeds(self._encode_pixels(video_frames))

    def append_frame_embeds(self, frame_embeds: jnp.ndarray) -> None:
        """`append_frames` for pre-computed embeddings (T, ft, H).

        Appends are O(chunk): the embeddings live in a preallocated
        (max_num_frames, ft, H) buffer written in place via a donated
        `dynamic_update_slice` (the KV cache's own pattern) — repeated
        concatenation would copy the whole history every call, quadratic
        over a long live session. Distinct chunk lengths each compile the
        tiny updater once; feed fixed-size chunks for steady state."""
        new = jnp.asarray(frame_embeds, self.dtype)
        base = len(self.frame_times)
        cap = self.args.max_num_frames
        if base + len(new) > cap:
            raise ValueError(
                f"append_frame_embeds: {base} + {len(new)} frames exceeds "
                f"max_num_frames {cap}"
            )
        if self.frame_embeds is None or self.frame_embeds.shape[0] != cap:
            buf = jnp.zeros(
                (cap, self.cfg.frame_num_tokens, new.shape[-1]), self.dtype
            )
            if self.frame_embeds is not None and base:
                buf = self._append_upd(buf, self.frame_embeds[:base], 0)
            self.frame_embeds = buf
        self.frame_embeds = self._append_upd(self.frame_embeds, new, base)
        self.frame_times.extend(
            (base + i) / self.frame_fps for i in range(len(new))
        )

    def stream_video(
        self, video_frames, chunk_frames: int = 64,
        upload_ahead: bool = False,
    ) -> List[Dict[str, Any]]:
        """Pixels → responses with vision/decode PIPELINING: chunk i+1's
        pixels are uploaded + vision-encoded while the decoder streams
        chunk i's frames (the reference — and our `input_video_stream` +
        `inference()` split — serializes the two phases,
        `test/inference.py:196-214,276-313`).

        All device work is async from the host: the vision dispatches for
        the NEXT chunk are enqueued before the current chunk's decode
        blocks, so the chip's program queue interleaves upload DMA,
        vision forwards and decode blocks with no idle phase boundary —
        the true pixels→responses wall approaches on-chip
        vision + decode compute instead of their wall-clock sum.

        ``upload_ahead=True`` pipelines the TRANSFER only: chunk i+1's
        pixels device_put (async DMA) while chunk i decodes, but its
        vision compute dispatches just-in-time, right before its own
        decode. On runtimes where a value fetch barriers the whole
        program queue (this rig: each block-score fetch would otherwise
        wait on the next chunk's enqueued vision forwards too), this
        keeps decode fetches barrier-free while still hiding the
        host→device pixel transfer behind decode compute.

        Queries must be fed (`input_query_stream`) BEFORE this call.
        Results are identical to the one-shot path (chunked feeding is
        pinned equal by `tests/test_infer_engine.py::TestAppendFrames`
        and `TestStreamVideo`; the per-chunk `inference()` calls continue
        one stream)."""
        video_frames = np.asarray(video_frames)
        # user turns are reported once up front; the per-chunk inference()
        # calls would re-list whatever is still queued at each call
        user_turns = [
            {"time": t, "content": q, "role": "user"} for t, q in self.query_queue
        ]
        responses: List[Dict[str, Any]] = []

        def run_pending(embeds, drain: bool) -> None:
            self.append_frame_embeds(embeds)
            # drain=False mid-stream: tails shorter than a block wait for
            # the next chunk instead of degrading to single-frame steps
            responses.extend(
                r for r in self.inference(drain=drain) if r["role"] != "user"
            )

        if upload_ahead:
            pending = None  # (buf, n): uploaded pixels, not yet encoded
            for start in range(0, len(video_frames), chunk_frames):
                buf_n = upload_pixels(
                    video_frames[start : start + chunk_frames], VISION_BATCH
                )  # async DMA; in flight through the previous chunk's decode
                if pending is not None:
                    run_pending(
                        encode_uploaded(
                            self._visual, self.params, *pending, VISION_BATCH
                        ),
                        drain=False,
                    )
                pending = buf_n
            if pending is not None:
                run_pending(
                    encode_uploaded(
                        self._visual, self.params, *pending, VISION_BATCH
                    ),
                    drain=True,
                )
            return sorted(responses + user_turns, key=lambda x: x["time"])

        pending = None  # device embeddings of the chunk ahead of decode
        for start in range(0, len(video_frames), chunk_frames):
            embeds = self._encode_pixels(
                video_frames[start : start + chunk_frames]
            )  # async: upload + vision forwards enqueue, no host sync
            if pending is not None:
                run_pending(pending, drain=False)
            pending = embeds
        if pending is not None:
            run_pending(pending, drain=True)
        return sorted(responses + user_turns, key=lambda x: x["time"])

    def input_vision_feats(self, feats) -> None:
        """Pre-extracted RAW SigLIP patch features (T, P, C) — the format
        `mmduet_tpu.data.preprocess` writes (reference `.pt` feature
        files, `data/utils.py:99-117`). Projector + pooling run on device
        once here."""
        feats = jnp.asarray(feats, self.dtype)
        embeds = mmduet.spatial_pool(
            mmduet.project(self.params, feats), self.cfg
        )
        self.input_frame_embeds(embeds)

    def input_query_stream(self, conversation: Sequence[dict]) -> None:
        for turn in conversation:
            if turn["role"] == "user":
                self.query_queue.append((turn["time"], turn["content"]))

    # ------------------------------------------------------------------
    # device feeding
    # ------------------------------------------------------------------

    def _embed_ids(self, ids: Sequence[int]) -> jnp.ndarray:
        return embed_tokens(
            self.params["decoder"],
            jnp.asarray(ids, jnp.int32),
            self.cfg.text.vocab_size,
        ).astype(self.dtype)

    def _norm_act(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pin a chunk to the canonical activation sharding (no-op off-mesh)."""
        return x if self._act_sharding is None else jax.device_put(
            x, self._act_sharding
        )

    def _feed(self, embeds: jnp.ndarray, compute_lm: bool = False):
        """Feed a (T,H) chunk: bucket-pad, run one step, advance cursor."""
        t_real = embeds.shape[0]
        bucket = pick_bucket(t_real)
        # guard on the PADDED size: the write is bucket-wide, and
        # dynamic_update_slice would silently clamp the start index and
        # overwrite live tail entries if the padded chunk overhangs
        self.state.check_fits(bucket)
        embeds = self._norm_act(pad_chunk(embeds, bucket))
        probs, logits, k, v = self._step(
            self.params, self.lora, embeds,
            self.state.kv_cache.k, self.state.kv_cache.v,
            jnp.int32(self.state.cursor), jnp.int32(t_real),
            compute_lm=compute_lm,
        )
        self.state.kv_cache = KVCache(k, v)
        self.state.cursor += t_real
        return probs, logits

    def _needs_joiner(self) -> bool:
        return self.state.cursor == 0 or (
            self.last_role == "assistant" and not self.args.remove_assistant_turns
        )

    def _frame_joiner_ids(self) -> List[int]:
        """Token ids to prepend to the next frame chunk (reference
        `inference.py:229-234` semantics)."""
        ids = frame_joiner_ids(
            self.state.cursor, self.last_role, self._pending_ids,
            self.args.remove_assistant_turns,
            self._start_ids, self._stream_open_ids,
        )
        if self.state.cursor != 0 and ids:
            self._pending_ids = []
        return ids

    def _encode_frame(self) -> Optional[Dict[str, float]]:
        if self.frame_embeds is None or self._next_frame >= len(self.frame_times):
            return None
        t0 = time.perf_counter()
        idx = self._next_frame
        self._next_frame += 1
        joiner = self._frame_joiner_ids()
        frame = self.frame_embeds[idx]
        chunk = (
            jnp.concatenate([self._embed_ids(joiner), frame], axis=0)
            if joiner
            else frame
        )
        probs, _ = self._feed(chunk)
        inf, rel = map(float, np.asarray(probs))  # host sync: ONE transfer
        self.frame_latencies_ms.append((time.perf_counter() - t0) * 1000)
        self.frame_idx += 1
        self.last_role = "stream"
        return {"informative_score": inf, "relevance_score": rel}

    def _dispatch_frames_block(self, n: int) -> jnp.ndarray:
        """Dispatch one n-frame fused block WITHOUT a host sync; returns
        the device-resident (2, n) score array. Cache/cursor/role state
        advance immediately (device execution is program-ordered, so
        later dispatches may safely queue behind this one)."""
        ft = self.cfg.frame_num_tokens
        self.state.check_fits(n * ft)
        idx = self._next_frame
        frames = self._norm_act(self.frame_embeds[idx : idx + n])
        scores, k, v = self._frames_block(
            self.params, self.lora, frames,
            self.state.kv_cache.k, self.state.kv_cache.v,
            jnp.int32(self.state.cursor),
        )
        self.state.kv_cache = KVCache(k, v)
        self.state.cursor += n * ft
        self._next_frame += n
        self.frame_idx += n
        self.last_role = "stream"
        return scores

    def _encode_frames_block(self, n: int) -> List[Dict[str, float]]:
        """Score n joiner-free frames in one device dispatch (ONE host sync
        for all n scores). Exact same cache contents as n single steps."""
        t0 = time.perf_counter()
        scores = np.asarray(self._dispatch_frames_block(n))  # ONE transfer
        inf, rel = scores[0], scores[1]
        per_frame = (time.perf_counter() - t0) * 1000 / n
        self.frame_latencies_ms.extend([per_frame] * n)
        return [
            {"informative_score": float(i), "relevance_score": float(r)}
            for i, r in zip(inf, rel)
        ]

    def _rollback_frames(self, k: int) -> None:
        """Un-consume the last k block frames: cursor rewind + queue rewind.
        Their cache slots are overwritten when they are re-encoded."""
        if k <= 0:
            return
        ft = self.cfg.frame_num_tokens
        self.state.cursor -= k * ft
        self._next_frame -= k
        self.frame_idx -= k
        del self.frame_latencies_ms[-k:]

    def _encode_query(self) -> None:
        _, query = self.query_queue.popleft()
        ids = self.tokenizer.apply_chat_template(
            [{"role": "user", "content": query}],
            tokenize=True,
            add_stream_query_prompt=self.last_role == "stream",
            add_stream_prompt=True,
        )
        self._feed(self._embed_ids(ids))
        self.last_role = "user"

    def _generate_response(self) -> str:
        gen_embeds = self._norm_act(self._embed_ids(self._gen_prompt_ids))
        t_real = gen_embeds.shape[0]
        # prompt prefill + the W-wide scratch commit after it
        # (`decode_loop` capacity contract: W = max(max_new - 1, 1))
        self.state.check_fits(
            t_real + max(self.args.max_new_tokens - 1, 1)
        )
        pre_gen_cursor = self.state.cursor
        packed, k, v, pen_mask = self._generate(
            self.params, self.lora, gen_embeds,
            self.state.kv_cache.k, self.state.kv_cache.v,
            jnp.int32(pre_gen_cursor), jnp.int32(t_real), self._pen_mask,
        )
        self.state.kv_cache = KVCache(k, v)
        self._pen_mask = pen_mask
        packed = np.asarray(packed)  # ONE fetch: tokens + n + cursor
        n = int(packed[-2])
        cursor = int(packed[-1])
        token_ids = packed[:n]
        if self.args.remove_assistant_turns:
            # rewind: keep the pre-response stream context only
            self.state.cursor = pre_gen_cursor
            self._pending_ids = []
        else:
            self.state.cursor = int(cursor)
            self._pending_ids = [int(token_ids[-1])] if n else []
        response = self.tokenizer.decode(token_ids, skip_special_tokens=True)
        self.last_role = "assistant"
        return response

    # ------------------------------------------------------------------
    # the streaming loop (reference inference.py:276-313)
    # ------------------------------------------------------------------

    def _threshold_triggered(self, stream_end_score: float) -> bool:
        return self._policy.triggered(stream_end_score)

    # back-compat views over the shared ThresholdPolicy state
    @property
    def stream_end_prob_list(self) -> List[float]:
        return self._policy.prob_list

    @property
    def stream_end_score_sum(self) -> float:
        return self._policy.score_sum

    def _block_budget(self) -> int:
        """How many frames can run in one block before the next query is due
        or the stream ends."""
        remaining = len(self.frame_times) - self._next_frame
        n = min(self.block_frames, remaining)
        if self.query_queue:
            q_time = self.query_queue[0][0]
            # frame i of the block is checked at video_time + i*interval
            free = int(
                np.ceil((q_time - self.video_time) / self.frame_interval - 1e-9)
            )
            n = min(n, max(free, 0))
        return n

    def _inference_grounding(self, drain: bool = True) -> List[Dict[str, Any]]:
        """Grounding-mode streaming with one-deep block pipelining: the
        next block is dispatched BEFORE the previous block's scores are
        fetched, so the per-block host round trip hides behind on-chip
        compute (measured ~10% p50: 6.7 → 6.0 ms/frame on one v5e).

        Safe exactly because grounding never generates
        (`test/inference.py:364-380` — scores only): a trigger cannot
        roll dispatched frames back, so the schedule (block boundaries,
        query interleave, the video clock) is score-independent. Score
        processing (debug rows + threshold-policy state) stays in frame
        order, so outputs are identical to the sequential loop (pinned by
        `tests/test_infer_engine.py::TestGroundingPipelined`).

        Per-frame latency in this mode is reported as the aggregate
        wall-clock over frames (overlap makes per-block walls
        unobservable)."""
        responses = [
            {"time": t, "content": q, "role": "user"} for t, q in self.query_queue
        ]
        t_wall = time.perf_counter()
        start_frame = self._next_frame
        lat_start = len(self.frame_latencies_ms)
        pending: Optional[Tuple[jnp.ndarray, int, float]] = None

        def process(scores: Dict[str, float], t: float) -> None:
            self.debug_data_list.append(dict(time=t, **scores))
            self._threshold_triggered(sum(
                v for k_, v in scores.items() if k_ in self.score_heads
            ))

        def drain_pending() -> None:
            nonlocal pending
            if pending is None:
                return
            dev, n, base_t = pending
            pending = None
            arr = np.asarray(dev)  # ONE transfer, overlapped with dispatch
            t = base_t
            for j in range(n):
                process(
                    {"informative_score": float(arr[0, j]),
                     "relevance_score": float(arr[1, j])},
                    t,
                )
                # repeated addition, bit-exact with the sequential loop's
                # per-frame accumulation (n*interval differs in the last
                # ulps at non-dyadic fps and could flip a query-due check)
                t += self.frame_interval

        while self._next_frame < len(self.frame_times):
            if not drain and (
                len(self.frame_times) - self._next_frame < self.block_frames
                and not (
                    self.query_queue
                    and self.video_time >= self.query_queue[0][0]
                )
            ):
                break
            if self.query_queue and self.video_time >= self.query_queue[0][0]:
                self._encode_query()
            n = self._block_budget()
            if n == self.block_frames and n >= 2 and not self._needs_joiner():
                base_t = self.video_time
                dev = self._dispatch_frames_block(n)
                # previous block: its RTT hides behind this dispatch
                drain_pending()
                pending = (dev, n, base_t)
                for _ in range(n):  # repeated addition: bit-exact clocks
                    self.video_time += self.frame_interval
            else:
                drain_pending()
                scores = self._encode_frame()
                process(scores, self.video_time)
                self.video_time += self.frame_interval
        drain_pending()

        n_frames = self._next_frame - start_frame
        total_ms = (time.perf_counter() - t_wall) * 1000
        # replace only THIS call's entries (single-step frames appended
        # theirs mid-loop) with the uniform aggregate; earlier calls'
        # entries are preserved for chunked live feeding
        del self.frame_latencies_ms[lat_start:]
        self.frame_latencies_ms.extend(
            [total_ms / max(n_frames, 1)] * n_frames
        )
        return sorted(responses, key=lambda x: x["time"])

    def inference(self, drain: bool = True) -> List[Dict[str, Any]]:
        """Stream all frames; returns the time-sorted response list in the
        reference's JSONL schema (`test/inference.py:276-313` semantics).

        Frames run in blocks of ``block_frames`` per device dispatch when no
        query or turn-joiner interrupts; a response trigger mid-block
        rolls the un-consumed frames back (cursor rewind) so results are
        bit-identical to single-frame stepping. Grounding mode routes to
        the pipelined loop (`_inference_grounding`).

        ``drain=False`` (the chunked live-feed/`stream_video` path): stop
        once fewer than ``block_frames`` frames remain and no query is
        due, leaving the tail for after the next `append_frame_embeds` —
        a mid-stream chunk boundary then never degrades to single-frame
        steps. Results are unchanged (block boundaries are score-neutral);
        only the dispatch granularity differs."""
        if self.grounding_mode and self.pipeline_grounding:
            return self._inference_grounding(drain)
        responses = [
            {"time": t, "content": q, "role": "user"} for t, q in self.query_queue
        ]
        while self._next_frame < len(self.frame_times):
            if not drain and (
                len(self.frame_times) - self._next_frame < self.block_frames
                and not (
                    self.query_queue
                    and self.video_time >= self.query_queue[0][0]
                )
            ):
                break
            if self.query_queue and self.video_time >= self.query_queue[0][0]:
                self._encode_query()

            n = self._block_budget()
            # only full blocks run fused (one compiled shape); tails and
            # joiner-bearing frames run as single steps
            if n == self.block_frames and n >= 2 and not self._needs_joiner():
                scores_list = self._encode_frames_block(n)
            else:
                scores_list = [self._encode_frame()]

            for i, scores in enumerate(scores_list):
                self.debug_data_list.append(dict(time=self.video_time, **scores))
                stream_end_score = sum(
                    v for k, v in scores.items() if k in self.score_heads
                )
                need_response = self._threshold_triggered(stream_end_score)
                if need_response and not self.grounding_mode:
                    # discard not-yet-evaluated block frames, re-run later
                    self._rollback_frames(len(scores_list) - 1 - i)
                    response = self._generate_response()
                    responses.append(
                        {
                            "time": self.video_time,
                            "content": response,
                            "role": "assistant",
                        }
                    )
                    self.video_time += self.frame_interval
                    break
                self.video_time += self.frame_interval
        return sorted(responses, key=lambda x: x["time"])
