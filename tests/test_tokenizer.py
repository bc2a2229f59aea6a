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


def test_real_bpe_with_constructed_vocab(tmp_path):
    """Exercise the byte-level BPE path with a small hand-built vocab:
    merges must apply in rank order and </w> suffixing must match CLIP."""
    import json
    # vocab: byte symbols + merged tokens
    tokens = ['l', 'o', 'w', 'e', 'r', '</w>', 'w</w>', 'er</w>', 'lo',
              'low', 'low</w>', 'lower</w>', '<|startoftext|>',
              '<|endoftext|>']
    vocab = {t: i for i, t in enumerate(tokens)}
    merges = ['#version: 0.2', 'l o', 'lo w', 'e r</w>', 'r </w>',
              'low er</w>', 'lo w</w>']
    (tmp_path / 'vocab.json').write_text(json.dumps(vocab))
    (tmp_path / 'merges.txt').write_text('\n'.join(merges))

    from mixofshow_tpu.text.tokenizer import CLIPTokenizer
    tok = CLIPTokenizer(str(tmp_path))
    assert not tok._fallback

    # 'lower' -> l o w e r</w> -> (l o)->lo -> (lo w)->low -> (e r</w>)->er</w>
    #          -> (low er</w>) -> lower</w>
    ids = tok.encode('lower', add_special_tokens=False)
    assert ids == [vocab['lower</w>']]
    # 'low' -> l o w</w> -> lo w</w> -> low</w>
    ids = tok.encode('low', add_special_tokens=False)
    assert ids == [vocab['low</w>']]
    # unmerged pieces fall back to symbol tokens
    ids = tok.encode('ow', add_special_tokens=False)
    assert ids == [vocab['o'], vocab['w</w>']]
