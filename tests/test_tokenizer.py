"""Tokenizer behavior: added concept tokens, padding, determinism."""
import numpy as np

from mixofshow_tpu.text import CLIPTokenizer
from mixofshow_tpu.text.tokenizer import BOS_TOKEN_ID, CLIP_VOCAB_SIZE, EOS_TOKEN_ID


def test_fixed_shape_and_special_tokens():
    tok = CLIPTokenizer()
    ids = tok(['a photo of a dog', 'hi'])
    assert ids.shape == (2, 77) and ids.dtype == np.int32
    assert ids[0, 0] == BOS_TOKEN_ID
    assert EOS_TOKEN_ID in ids[0]
    # padding with eos after the sentence
    assert ids[1, -1] == EOS_TOKEN_ID


def test_added_tokens_are_sequential_and_reserved():
    tok = CLIPTokenizer()
    names = [f'<new{i}>' for i in range(16)]
    assert tok.add_tokens(names) == 16
    assert tok.convert_tokens_to_ids('<new0>') == CLIP_VOCAB_SIZE
    assert tok.convert_tokens_to_ids('<new15>') == CLIP_VOCAB_SIZE + 15
    assert len(tok) == CLIP_VOCAB_SIZE + 16
    # re-adding returns 0 (reference asserts num_added == requested)
    assert tok.add_tokens(['<new0>']) == 0
    # longest-first matching: <new12> must not tokenize as <new1> + '2>'
    ids = tok('a <new12> on the beach')[0]
    assert CLIP_VOCAB_SIZE + 12 in ids
    assert CLIP_VOCAB_SIZE + 1 not in ids


def test_determinism_and_truncation():
    tok = CLIPTokenizer()
    a = tok('a photo of a <thing> next to a castle')
    b = tok('a photo of a <thing> next to a castle')
    np.testing.assert_array_equal(a, b)
    long = tok(' '.join(['word'] * 200))
    assert long.shape == (1, 77)
    assert long[0, -1] == EOS_TOKEN_ID
