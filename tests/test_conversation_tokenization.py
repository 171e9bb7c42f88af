"""Golden tests for the v1 prompt template and sentinel tokenization."""

import numpy as np

from revisionllm_tpu import conversation as conv
from revisionllm_tpu.constants import IMAGE_TOKEN_INDEX, MEMORY_TOKEN_INDEX
from revisionllm_tpu.tokenization import split_at_sentinels, tokenizer_image_token

SYSTEM = (
    "A chat between a curious user and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the user's questions."
)


class FakeTokenizer:
    """Deterministic word-level tokenizer with BOS=1, for splice-layout tests."""

    bos_token_id = 1

    def __init__(self):
        self.vocab = {}

    def _tok(self, text):
        ids = [self.bos_token_id]
        for w in text.split():
            if w not in self.vocab:
                self.vocab[w] = len(self.vocab) + 10
            ids.append(self.vocab[w])
        return ids

    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = self._tok(text)
        return r


class TestConversationV1:
    def test_user_turn_prompt(self):
        c = conv.CONV_VICUNA_V1
        query = "<video>\nDuring which frames can we see a dog?"
        prompt = c.user_turn_prompt(query)
        assert prompt == SYSTEM + " USER: " + query + " ASSISTANT:"

    def test_full_round(self):
        c = conv.CONV_VICUNA_V1
        prompt = c.prompt([("USER", "hi"), ("ASSISTANT", "From 01 to 02.")])
        assert prompt == SYSTEM + " USER: hi ASSISTANT: From 01 to 02.</s>"

    def test_stop_str(self):
        assert conv.CONV_VICUNA_V1.stop_str == "</s>"


class TestTokenizerImageToken:
    def test_video_sentinel_spliced(self):
        tok = FakeTokenizer()
        ids = tokenizer_image_token("hello <video> world", tok)
        # With BOS offset=1 the [sep]*(offset+1) list also drops its first
        # element, leaving exactly one sentinel (reference mm_utils.py:43-69).
        assert ids[0] == tok.bos_token_id
        assert ids.count(IMAGE_TOKEN_INDEX) == 1
        # golden layout: [BOS, hello, -200, world]
        assert ids == [1, tok.vocab["hello"], IMAGE_TOKEN_INDEX, tok.vocab["world"]]

    def test_memory_sentinel(self):
        tok = FakeTokenizer()
        ids = tokenizer_image_token("a <video> b <memory> c", tok)
        assert ids.count(IMAGE_TOKEN_INDEX) == 1
        assert ids.count(MEMORY_TOKEN_INDEX) == 1
        # memory comes after image
        assert ids.index(MEMORY_TOKEN_INDEX) > ids.index(IMAGE_TOKEN_INDEX)
        # reference quirk kept: the chunk after <memory> retains its BOS
        # (mm_utils.py:59 extends prompt_chunks[2] in full)
        assert ids[ids.index(MEMORY_TOKEN_INDEX) + 1] == tok.bos_token_id

    def test_round_trip_segments(self):
        tok = FakeTokenizer()
        ids = tokenizer_image_token("a <video> b", tok)
        segments, kinds = split_at_sentinels(ids)
        assert kinds == ["image"]
        assert segments[0][0] == tok.bos_token_id
        assert len(segments[1]) > 0

    def test_numpy_output(self):
        tok = FakeTokenizer()
        arr = tokenizer_image_token("x <video> y", tok, return_numpy=True)
        assert isinstance(arr, np.ndarray) and arr.dtype == np.int32
