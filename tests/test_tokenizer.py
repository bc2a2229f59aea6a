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


def test_pretokenizer_goldens():
    """Pin the CLIP pre-tokenization regex behavior (contractions split,
    single digits, punctuation runs, lowercasing, whitespace cleanup) —
    hand-verified against the published CLIP pattern
    (openai/CLIP simple_tokenizer, used by transformers CLIPTokenizer,
    loaded by the reference at trainer_edlora.py:39)."""
    from mixofshow_tpu.text.tokenizer import _PAT, whitespace_clean

    cases = {
        "it's 3 dogs, blue-ish!":
            ['it', "'s", '3', 'dogs', ',', 'blue', '-', 'ish', '!'],
        "we'll i'm you're they've he'd can't":
            ['we', "'ll", 'i', "'m", 'you', "'re", 'they', "'ve",
             'he', "'d", 'can', "'t"],
        'a  photo\tof\na dog':
            ['a', 'photo', 'of', 'a', 'dog'],
        '24 cats':
            ['2', '4', 'cats'],           # digits tokenize one at a time
        'x<|endoftext|>y':
            ['x', '<|endoftext|>', 'y'],  # specials survive pretokenization
        '@#$ hello_world':
            ['@#$', 'hello', '_', 'world'],
    }
    for text, want in cases.items():
        got = _PAT.findall(whitespace_clean(text).lower())
        assert got == want, (text, got, want)


def test_bpe_matches_independent_reimplementation(tmp_path):
    """Cross-check _bpe against a naive, obviously-correct BPE: repeatedly
    apply the single lowest-rank merge present. Randomized merge tables over
    a real byte alphabet — pins merge-order semantics, the </w> suffix rule,
    and tie handling beyond the hand-built fixture above."""
    import json
    import random

    rng = random.Random(7)
    alphabet = list('abcdefgh')
    symbols = alphabet + [c + '</w>' for c in alphabet]
    merges = []
    pool = list(symbols)
    for _ in range(40):
        a = rng.choice([s for s in pool if not s.endswith('</w>')])
        b = rng.choice(pool)
        if (a, b) in merges or len(a + b) > 12:
            continue
        merges.append((a, b))
        pool.append(a + b)
    vocab = {t: i for i, t in enumerate(dict.fromkeys(symbols + [a + b for a, b in merges]))}
    vocab['<|startoftext|>'] = len(vocab)
    vocab['<|endoftext|>'] = len(vocab)
    (tmp_path / 'vocab.json').write_text(json.dumps(vocab))
    (tmp_path / 'merges.txt').write_text(
        '\n'.join(['#version: 0.2'] + [f'{a} {b}' for a, b in merges]))
    tok = CLIPTokenizer(str(tmp_path))
    ranks = {m: i for i, m in enumerate(merges)}

    def naive_bpe(token):
        word = list(token[:-1]) + [token[-1] + '</w>']
        while len(word) > 1:
            pairs = [(ranks.get((word[i], word[i + 1]), float('inf')), i)
                     for i in range(len(word) - 1)]
            best_rank, _ = min(pairs)
            if best_rank == float('inf'):
                break
            # merge EVERY occurrence of the best pair left-to-right
            best = next(p for r, i in pairs if r == best_rank
                        for p in [(word[i], word[i + 1])])
            out, i = [], 0
            while i < len(word):
                if (i < len(word) - 1
                        and (word[i], word[i + 1]) == best):
                    out.append(word[i] + word[i + 1])
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        return ' '.join(word)

    words = [''.join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
             for _ in range(300)]
    for w in words:
        assert tok._bpe(w) == naive_bpe(w), w


def test_fallback_golden_vectors():
    """Frozen (prompt → ids) regression goldens for the constructed-vocab
    fallback (the path every weights-less environment runs): any change to
    hashing, pretokenization, special tokens, or padding shows up here."""
    tok = CLIPTokenizer()
    ids = tok(['a photo of a dog', ''], max_length=10)
    assert ids.shape == (2, 10)
    # LITERAL frozen ids (sha256-derived): any change to hashing,
    # pretokenization, specials, or padding breaks these exact values
    golden_first = [49406, 19890, 4285, 43920, 19890, 42805,
                    49407, 49407, 49407, 49407]
    np.testing.assert_array_equal(ids[0], golden_first)
    np.testing.assert_array_equal(ids[1][:2], [49406, 49407])
    assert ids[0, 1] == ids[0, 4]  # same word, same id


def _build_full_bytelevel_vocab(tmp_path, seed=11, n_merges=300):
    """A CLIP-shaped vocab/merges pair: all 256 byte symbols (+ '</w>'
    variants), randomized letter merges, filler to exactly 49408 ids with
    <|startoftext|>/<|endoftext|> at 49406/49407 — same layout as the real
    openai/clip-vit-large-patch14 files, so both libraries agree on
    bos/eos/pad ids and every added token lands at 49408+k."""
    import json
    import random

    from mixofshow_tpu.text.tokenizer import bytes_to_unicode

    b2u = bytes_to_unicode()
    syms = list(b2u.values())
    vocab_tokens = syms + [s + '</w>' for s in syms]
    rng = random.Random(seed)
    letters = [b2u[ord(c)] for c in 'abcdefghijklmnopqrstuvwxyz']
    pool = letters + [s + '</w>' for s in letters]
    merges, seen = [], set()
    while len(merges) < n_merges:
        a = rng.choice([s for s in pool if not s.endswith('</w>')])
        b = rng.choice(pool)
        if (a, b) in seen or len(a + b) > 14:
            continue
        seen.add((a, b))
        merges.append((a, b))
        pool.append(a + b)
        if a + b not in vocab_tokens:
            vocab_tokens.append(a + b)
    vocab_tokens += [f'[fill{i}]' for i in
                     range(CLIP_VOCAB_SIZE - 2 - len(vocab_tokens))]
    vocab_tokens += ['<|startoftext|>', '<|endoftext|>']
    vocab = {t: i for i, t in enumerate(vocab_tokens)}
    assert len(vocab) == CLIP_VOCAB_SIZE
    (tmp_path / 'vocab.json').write_text(
        json.dumps(vocab, ensure_ascii=False), encoding='utf-8')
    (tmp_path / 'merges.txt').write_text(
        '\n'.join(['#version: 0.2'] + [f'{a} {b}' for a, b in merges]),
        encoding='utf-8')


def test_matches_transformers_clip_tokenizer(tmp_path):
    """Cross-LIBRARY parity: identical ids vs the installed
    transformers.CLIPTokenizer (the exact class the reference loads,
    trainer_edlora.py:39) on a constructed full-size byte-level vocab —
    punctuation, unicode/CJK, contractions, digits, specials, added concept
    tokens, and the padded (B, 77) __call__ surface."""
    import random
    import string

    from transformers import CLIPTokenizer as HFCLIPTokenizer

    _build_full_bytelevel_vocab(tmp_path)
    hf = HFCLIPTokenizer(str(tmp_path / 'vocab.json'),
                         str(tmp_path / 'merges.txt'))
    mine = CLIPTokenizer(str(tmp_path))
    assert not mine._fallback
    assert (hf.bos_token_id, hf.eos_token_id, hf.pad_token_id) == (
        BOS_TOKEN_ID, EOS_TOKEN_ID, mine.pad_token_id)

    texts = [
        'a photo of a dog',
        "it's 3 dogs, blue-ish!",
        "we'll I'M you're THEY'VE he'd can't",
        'héllo wörld — café naïve',
        'emoji 🐶 and 🔥 fire',
        '24 cats & 7 dogs!!',
        'x<|endoftext|>y',
        '   lots   of \t whitespace \n here ',
        'unicode: 日本語 テスト',   # CJK: per-char words via basic_clean
        'don’t stop',
        'a-b_c.d/e\\f @#$%',
    ]
    rng = random.Random(3)
    charset = string.ascii_letters + "0123456789'!,.-—é日🐱"
    for _ in range(80):
        texts.append(' '.join(
            ''.join(rng.choice(charset)
                    for _ in range(rng.randint(1, 10)))
            for _ in range(rng.randint(1, 12))))

    for t in texts:
        assert (hf.encode(t, add_special_tokens=False)
                == mine.encode(t, add_special_tokens=False)), t

    # full padded batch surface (what the pipelines feed the device)
    batch = texts[:8]
    got = mine(batch)
    want = np.asarray(hf(batch, padding='max_length', max_length=77,
                         truncation=True)['input_ids'], np.int32)
    np.testing.assert_array_equal(got, want)

    # added concept tokens: same ids, same longest-first matching
    names = ['<new0>', '<new1>', '<new12>']
    assert hf.add_tokens(names) == mine.add_tokens(names) == 3
    for t in ['a <new12> and <new0> here', '<new1>x<new12>']:
        assert (hf.encode(t, add_special_tokens=False)
                == mine.encode(t, add_special_tokens=False)), t
