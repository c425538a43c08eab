"""Golden tests for the duet chat format + learn ranges + labels."""

import numpy as np
import pytest

from mmduet_tpu.stream import (
    BOS,
    EOS,
    CharTokenizer,
    StreamTemplate,
    char_ranges_to_token_labels,
    frame_label_positions,
    get_informative_labels,
    get_learn_ranges,
    get_relevance_labels,
    render_conversation,
    scatter_frame_labels,
)
from mmduet_tpu.stream.labels import IGNORE_INDEX

TPL = StreamTemplate(frame_num_tokens=3, v_placeholder="<image>")

CHAT = [
    {"role": "system", "content": "Sys."},
    {"role": "stream", "num_frames": 2, "learn": True},
    {"role": "user", "content": "Q1?"},
    {"role": "assistant", "content": "A1.", "learn": True},
    {"role": "stream", "num_frames": 3, "learn": True},
    {"role": "assistant", "content": "A2.", "learn": True},
]


def test_render_golden():
    text = render_conversation(CHAT, template=TPL)
    img = "<image>" * 3
    expected = (
        f"{BOS}system\nSys.{EOS}"
        f"\n{BOS}stream\n{img * 2}{EOS}"
        f"\n{BOS}user\nQ1?{EOS}"
        f"\n{BOS}assistant\nA1.{EOS}"
        f"\n{BOS}stream\n{img * 3}{EOS}"
        f"\n{BOS}assistant\nA2.{EOS}"
    )
    assert text == expected


def test_learn_ranges_cover_learned_content():
    text = render_conversation(CHAT, template=TPL)
    ranges = get_learn_ranges(CHAT, template=TPL)
    assert len(ranges) == 2
    assert text[ranges[0].start : ranges[0].stop] == "A1." + EOS
    assert text[ranges[1].start : ranges[1].stop] == "A2." + EOS


def test_unlearned_assistant_not_in_ranges():
    chat = [
        {"role": "system", "content": "S"},
        {"role": "assistant", "content": "X", "learn": False},
        {"role": "assistant", "content": "Y", "learn": True},
    ]
    text = render_conversation(chat, template=TPL)
    ranges = get_learn_ranges(chat, template=TPL)
    assert len(ranges) == 1
    assert text[ranges[0].start : ranges[0].stop] == "Y" + EOS


def test_empty_stream_turn_skipped():
    chat = [{"role": "system", "content": "S"}, {"role": "stream", "num_frames": 0}]
    assert render_conversation(chat, template=TPL) == f"{BOS}system\nS{EOS}"


def test_generation_prompt_modes():
    sys_only = [{"role": "system", "content": "S"}]
    base = render_conversation(sys_only, template=TPL)
    assert (
        render_conversation(sys_only, template=TPL, add_generation_prompt=True)
        == base + f"\n{BOS}assistant\n"
    )
    # the fragments the streaming engine pre-tokenizes (inference.py:61-63)
    assert (
        render_conversation([{}], template=TPL, add_stream_prompt=True)
        == f"\n{BOS}stream\n"
    )
    assert (
        render_conversation([{}], template=TPL, add_stream_generation_prompt=True)
        == f"{EOS}\n{BOS}assistant\n"
    )


def test_streaming_fragments_reconstruct_full_render():
    """The incremental prompts must concatenate to the full-render layout."""
    img = "<image>" * TPL.frame_num_tokens
    start = render_conversation([{"role": "system", "content": "S"}], template=TPL)
    stream_open = render_conversation([{}], template=TPL, add_stream_prompt=True)
    # stream 2 frames then close + assistant header:
    gen = render_conversation([{}], template=TPL, add_stream_generation_prompt=True)
    incremental = start + stream_open + img * 2 + gen + "Hi" + EOS

    full = render_conversation(
        [
            {"role": "system", "content": "S"},
            {"role": "stream", "num_frames": 2},
            {"role": "assistant", "content": "Hi"},
        ],
        template=TPL,
    )
    assert incremental == full


def test_stream_query_prompt_applies_to_every_user_turn():
    """Reference Jinja semantics (fuzz-verified byte-identical over 1000
    random conversations): add_stream_query_prompt prefixes eos on EVERY
    user turn — not on the fragment's first turn of other roles."""
    frag = render_conversation(
        [
            {"role": "assistant", "content": "A"},
            {"role": "user", "content": "Q1"},
            {"role": "user", "content": "Q2"},
        ],
        template=TPL,
        add_stream_query_prompt=True,
    )
    assert frag == (
        f"\n{BOS}assistant\nA{EOS}"  # non-user first turn: NO eos prefix
        f"{EOS}\n{BOS}user\nQ1{EOS}"
        f"{EOS}\n{BOS}user\nQ2{EOS}"
    )


def test_fragment_first_turn_keeps_leading_newline():
    """Reference Jinja (`tokenization_live.py:44-53`) prefixes EVERY
    user/assistant/stream turn with '\\n', even as a fragment's first turn
    (the engine feeds such fragments after a kept assistant turn). Only a
    system turn opens bare."""
    frag = render_conversation(
        [{"role": "user", "content": "Q"}], template=TPL, add_stream_prompt=True
    )
    assert frag == f"\n{BOS}user\nQ{EOS}\n{BOS}stream\n"
    assert render_conversation(
        [{"role": "system", "content": "S"}], template=TPL
    ).startswith(BOS)


def test_stream_query_prompt_closes_open_stream():
    """A user query arriving mid-stream closes the stream turn, reopens it."""
    img = "<image>" * TPL.frame_num_tokens
    start = render_conversation([{"role": "system", "content": "S"}], template=TPL)
    stream_open = render_conversation([{}], template=TPL, add_stream_prompt=True)
    query = render_conversation(
        [{"role": "user", "content": "Q"}],
        template=TPL,
        add_stream_query_prompt=True,
        add_stream_prompt=True,
    )
    incremental = start + stream_open + img + query + img

    full = render_conversation(
        [
            {"role": "system", "content": "S"},
            {"role": "stream", "num_frames": 1},
            {"role": "user", "content": "Q"},
            {"role": "stream", "num_frames": 1},
        ],
        template=TPL,
    )
    # full render closes the final stream turn with EOS; incremental leaves it open
    assert incremental + EOS == full


def test_informative_labels():
    chat = [
        {"role": "system", "content": "S"},
        {"role": "stream", "num_frames": 4, "learn": True},
        {"role": "assistant", "content": "A", "learn": True, "response_frame_num": 2},
        {"role": "stream", "num_frames": 2, "learn": False},
        {"role": "stream", "num_frames": 3, "learn": True},
        {"role": "user", "content": "Q"},
    ]
    assert get_informative_labels(chat) == [0, 0, 1, 1, -100, -100, 0, 0, 0]


def test_informative_labels_last_turn_stream():
    chat = [{"role": "stream", "num_frames": 2, "learn": True}]
    assert get_informative_labels(chat) == [0, 0]


def test_relevance_labels():
    chat = [
        {
            "role": "stream",
            "num_frames": 5,
            "learn": True,
            "related": [
                {"related": False, "num_frames": 2},
                {"related": True, "num_frames": 3},
            ],
        },
        {"role": "stream", "num_frames": 1, "learn": False},
    ]
    assert get_relevance_labels(chat) == [0, 0, 1, 1, 1, -100]


class TestTokenLabels:
    tok = CharTokenizer(frame_num_tokens=3)

    def _encode(self, chat):
        text = self.tok.apply_chat_template(chat)
        ids, offsets = self.tok.encode_with_offsets(text)
        ranges = self.tok.get_learn_ranges(chat)
        return text, np.array(ids), offsets, ranges

    def test_preshifted_labels_decode_to_learned_text(self):
        text, ids, offsets, ranges = self._encode(CHAT)
        labels = char_ranges_to_token_labels(ids, offsets, ranges)
        # labels are pre-shifted: labels[i] is the target AFTER position i.
        learned = labels[labels != IGNORE_INDEX]
        got = self.tok.decode(learned, skip_special_tokens=False)
        assert got == "A1." + EOS + "A2." + EOS

    def test_preshift_alignment(self):
        """labels[i] must equal input_ids[i+1] wherever set."""
        _, ids, offsets, ranges = self._encode(CHAT)
        labels = char_ranges_to_token_labels(ids, offsets, ranges)
        (pos,) = np.nonzero(labels != IGNORE_INDEX)
        assert pos.max() < len(ids) - 1 or labels[-1] == IGNORE_INDEX
        np.testing.assert_array_equal(labels[pos], ids[pos + 1])

    def test_final_eos_edge_case(self):
        """Learned assistant turn as the LAST message: range ends past the
        last token start (the trailing eos) — reference data_collator.py:31-34."""
        chat = [
            {"role": "system", "content": "S"},
            {"role": "assistant", "content": "End", "learn": True},
        ]
        _, ids, offsets, ranges = self._encode(chat)
        labels = char_ranges_to_token_labels(ids, offsets, ranges)
        learned = labels[labels != IGNORE_INDEX]
        assert self.tok.decode(learned, skip_special_tokens=False) == "End" + EOS
        # the final label slot is the second-to-last position (predicting eos)
        assert labels[-2] == self.tok.eos_token_id
        assert labels[-1] == IGNORE_INDEX

    def test_frame_label_positions_are_last_image_token(self):
        _, ids, offsets, ranges = self._encode(CHAT)
        pos = frame_label_positions(ids, self.tok.v_placeholder_id, 3)
        assert len(pos) == 5  # 2 + 3 frames
        # every position is an <image> token and the next token is NOT part
        # of the same frame (i.e. position is 3rd of each triple)
        (v_pos,) = np.nonzero(ids == self.tok.v_placeholder_id)
        assert set(pos) == set(v_pos[2::3])

    def test_scatter_frame_labels(self):
        _, ids, offsets, ranges = self._encode(CHAT)
        inf = get_informative_labels(CHAT)
        vec = scatter_frame_labels(ids, self.tok.v_placeholder_id, 3, inf)
        pos = frame_label_positions(ids, self.tok.v_placeholder_id, 3)
        np.testing.assert_array_equal(vec[pos], inf)
        mask = np.ones(len(ids), bool)
        mask[pos] = False
        assert (vec[mask] == IGNORE_INDEX).all()

    def test_scatter_none_labels(self):
        _, ids, offsets, ranges = self._encode(CHAT)
        vec = scatter_frame_labels(ids, self.tok.v_placeholder_id, 3, None)
        assert (vec == IGNORE_INDEX).all()

    def test_misaligned_range_raises(self):
        _, ids, offsets, _ = self._encode(CHAT)
        with pytest.raises(ValueError):
            char_ranges_to_token_labels(ids, offsets, [range(10**9, 10**9 + 2)])


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer(frame_num_tokens=2)
    text = f"{BOS}user\nhi<image><image>{EOS}"
    ids, offsets = tok.encode_with_offsets(text)
    # offsets tile the string exactly
    assert offsets[0][0] == 0 and offsets[-1][1] == len(text)
    for (a, b), (c, d) in zip(offsets, offsets[1:]):
        assert b == c
    assert tok.decode(ids, skip_special_tokens=False) == text
    assert tok.decode(ids) == "user\nhi"
