"""Label machinery on a REAL byte-level-BPE fast tokenizer.

Round 1 only exercised the synthetic 1-char-per-token CharTokenizer; real
Qwen2 offsets are multi-char and can merge across learn-range boundaries
(the reference's exact failure surface, SURVEY.md §7 "hard parts" /
`data/data_collator.py:29-35`). This builds a Qwen2-STYLE tokenizer
offline — byte-level BPE trained with the Qwen2 pre-tokenizer regex and
the real special tokens — and runs the full render → offsets →
`char_ranges_to_token_labels` → decode round-trip through
`HFTokenizerAdapter`.
"""

import numpy as np
import pytest

pytest.importorskip("tokenizers")
pytest.importorskip("transformers")

from mmduet_tpu.stream import (
    BOS,
    EOS,
    HFTokenizerAdapter,
    char_ranges_to_token_labels,
    frame_label_positions,
    get_informative_labels,
    scatter_frame_labels,
)
from mmduet_tpu.stream.labels import IGNORE_INDEX

# Qwen2's GPT-4-style pre-tokenizer split (tokenizer.json `Split` pattern)
QWEN2_SPLIT = (
    r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|"""
    r"""[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|"""
    r"""\s*[\r\n]+|\s+(?!\S)|\s+"""
)


def build_qwen2_style_tokenizer(vocab_size: int = 800):
    """Train a small byte-level BPE with Qwen2's pre-tokenization scheme
    and special tokens; wrap as a transformers fast tokenizer."""
    from tokenizers import Regex, Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.Sequence(
        [
            pre_tokenizers.Split(Regex(QWEN2_SPLIT), behavior="isolated"),
            pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
        ]
    )
    tok.decoder = decoders.ByteLevel()
    corpus = [
        "A multimodal AI assistant is helping users with some activities."
        " Below is their conversation, interleaved with the list of video"
        " frames received by the assistant.",
        "system\nuser\nassistant\nstream\n",
        "The person is cutting vegetables. Then they stir the pot.\n\n"
        "Now the dish is plated.\n\nDone.",
        "What is happening in the video? Please describe the scene.",
        "A1. A2. Sure, here is the answer: the man jumps.\n\n\n",
        "0123456789 the cat sat on the mat. the dog ran away!",
    ] * 4
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, show_progress=False,
        special_tokens=["<|endoftext|>"],
        # full byte coverage like real byte-level BPEs — no char is OOV
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(corpus, trainer)
    tok.add_special_tokens([BOS, EOS])  # atomic, split the text like Qwen2's
    return PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token=BOS,
        eos_token=EOS,
        pad_token="<|endoftext|>",
    )


@pytest.fixture(scope="module")
def adapter():
    hf = build_qwen2_style_tokenizer()
    return HFTokenizerAdapter(hf, frame_num_tokens=3, v_placeholder="<image>")


CHAT = [
    {"role": "system", "content": "A multimodal AI assistant is helping users."},
    {"role": "stream", "num_frames": 2, "learn": True},
    {"role": "user", "content": "What is happening in the video?"},
    {"role": "assistant", "content": "The person is cutting vegetables.", "learn": True},
    {"role": "stream", "num_frames": 3, "learn": True},
    {"role": "assistant", "content": "Now the dish is plated.", "learn": True,
     "response_frame_num": 2},
]


def test_bpe_offsets_are_multichar(adapter):
    text = adapter.apply_chat_template(CHAT)
    ids, offsets = adapter.encode_with_offsets(text)
    widths = [e - s for s, e in offsets]
    assert max(widths) > 1, "fixture degenerated to 1-char tokens"
    assert len(ids) < len(text)


def test_special_tokens_atomic(adapter):
    text = adapter.apply_chat_template(CHAT)
    ids, offsets = adapter.encode_with_offsets(text)
    assert adapter.v_placeholder_id == adapter.vocab_size - 1  # last vocab id
    n_eos = sum(1 for t in ids if t == adapter.eos_token_id)
    assert n_eos == len(CHAT)  # one eos per turn
    img_ids = [t for t in ids if t == adapter.v_placeholder_id]
    assert len(img_ids) == 5 * 3  # 5 frames x 3 placeholder tokens


def test_learned_labels_decode_to_learned_text(adapter):
    """The canonical round-trip (mirrors test_stream_template.py:178-207)
    on real BPE offsets: pre-shifted label targets decode back to exactly
    the learned assistant messages + eos."""
    text = adapter.apply_chat_template(CHAT)
    ids, offsets = adapter.encode_with_offsets(text)
    ranges = adapter.get_learn_ranges(CHAT)
    assert len(ranges) == 2
    labels = char_ranges_to_token_labels(np.array(ids), offsets, ranges, strict=True)
    targets = labels[labels != IGNORE_INDEX]
    decoded = adapter.decode(targets, skip_special_tokens=False)
    assert decoded == (
        "The person is cutting vegetables." + EOS + "Now the dish is plated." + EOS
    )
    # pre-shift contract: position i predicts token i+1
    (lab_pos,) = np.nonzero(labels != IGNORE_INDEX)
    for p in lab_pos:
        assert labels[p] == ids[p + 1]


def test_final_eos_edge_case(adapter):
    """Learn range ending at the very last char of the text (the trailing
    eos) takes the stop = len(ids) branch (`data_collator.py:31-34`)."""
    chat = CHAT[:4]  # ends with a learned assistant turn
    text = adapter.apply_chat_template(chat)
    ids, offsets = adapter.encode_with_offsets(text)
    ranges = adapter.get_learn_ranges(chat)
    labels = char_ranges_to_token_labels(np.array(ids), offsets, ranges, strict=True)
    targets = labels[labels != IGNORE_INDEX]
    assert adapter.decode(targets, skip_special_tokens=False) == (
        "The person is cutting vegetables." + EOS
    )
    assert labels[-1] == IGNORE_INDEX  # last position has no next token


def test_frame_labels_scatter_on_bpe(adapter):
    text = adapter.apply_chat_template(CHAT)
    ids, _ = adapter.encode_with_offsets(text)
    ids = np.array(ids)
    pos = frame_label_positions(ids, adapter.v_placeholder_id, 3)
    assert len(pos) == 5
    inf = get_informative_labels(CHAT)
    # stream1 precedes a USER turn -> all 0; stream2 precedes an assistant
    # turn with response_frame_num=2 -> last two frames get 1
    assert inf == [0, 0, 0, 1, 1]
    vec = scatter_frame_labels(ids, adapter.v_placeholder_id, 3, inf)
    assert list(vec[pos]) == inf
    assert (vec != IGNORE_INDEX).sum() == 5


def test_merged_boundary_snaps_not_crashes(adapter):
    """An assistant message starting with '\\n' merges the header's
    trailing newline into one BPE token: strict mode raises (the
    reference would crash, `data_collator.py:30`), tolerant mode snaps
    to the covering token and still recovers the message text."""
    chat = [
        {"role": "system", "content": "Sys."},
        {"role": "user", "content": "Q?"},
        {"role": "assistant", "content": "\nIndented answer.", "learn": True},
        {"role": "user", "content": "More?"},
    ]
    text = adapter.apply_chat_template(chat)
    ids, offsets = adapter.encode_with_offsets(text)
    ranges = adapter.get_learn_ranges(chat)
    starts = {s for s, _ in offsets}
    if ranges[0].start in starts:
        pytest.skip("fixture BPE did not learn the newline merge")
    with pytest.raises(ValueError):
        char_ranges_to_token_labels(np.array(ids), offsets, ranges, strict=True)
    labels = char_ranges_to_token_labels(np.array(ids), offsets, ranges)
    targets = labels[labels != IGNORE_INDEX]
    decoded = adapter.decode(targets, skip_special_tokens=False)
    assert "Indented answer." + EOS in decoded


def test_fragment_encodings_concatenate_like_full_render(adapter):
    """The engine's incremental fragments, encoded separately, must
    concatenate to the same ids as the full render (BPE must not merge
    across fragment boundaries — guaranteed because every fragment edge
    is a special token)."""
    sys_ids = adapter.apply_chat_template(
        [{"role": "system", "content": "Sys."}], tokenize=True
    )
    stream_open = adapter.encode(f"\n{BOS}stream\n")
    frame = adapter.encode("<image>" * 3)
    gen = adapter.encode(f"{EOS}\n{BOS}assistant\n")
    answer = adapter.encode("Hi there.")
    incremental = sys_ids + stream_open + frame * 2 + gen + answer + [adapter.eos_token_id]
    full = adapter.apply_chat_template(
        [
            {"role": "system", "content": "Sys."},
            {"role": "stream", "num_frames": 2},
            {"role": "assistant", "content": "Hi there."},
        ],
        tokenize=True,
    )
    assert incremental == full
