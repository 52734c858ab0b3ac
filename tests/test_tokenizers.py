"""Tokenizer tests.

ByT5: byte-level encode/decode and HF-parity (existing coverage lives in
test_cond.py's encoder tests; here we pin the CLIP BPE).

CLIP BPE: token-for-token parity against transformers' slow CLIPTokenizer
built from an IDENTICAL merge table, plus goldens for the open_clip-specific
behaviors where transformers-without-ftfy deviates (contractions, multi-char
punctuation — open_clip is the parity target, reference:
src_distributed/utils.py:73-75).
"""
import json

import numpy as np
import pytest

from paella_tpu.cond.tokenizers import (
    DEFAULT_NUM_MERGES,
    CLIPTokenizer,
    bytes_to_unicode,
    write_merges_file,
)

# A small but real merge table: enough structure to exercise rank ordering,
# multi-step merges and </w> handling.
MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("i", "n"),
    ("a", "n"),
    ("r", "e"),
    ("o", "n"),
    ("e", "r</w>"),
    ("c", "a"),
    ("ca", "t</w>"),
    ("d", "o"),
    ("do", "g</w>"),
    ("p", "h"),
    ("ph", "o"),
    ("pho", "t"),
    ("phot", "o</w>"),
    ("in", "g</w>"),
    ("an", "d</w>"),
    ("o", "f</w>"),
    ("a", "t</w>"),
    ("s", "t"),
    ("re", "d</w>"),
    ("1", "9"),
    ("19", "2"),
    ("192", "0</w>"),
]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("bpe") / "merges.txt"
    write_merges_file(MERGES, str(p))
    return CLIPTokenizer(str(p), num_merges=len(MERGES))


@pytest.fixture(scope="module")
def hf_tok(tok, tmp_path_factory):
    """transformers slow CLIPTokenizer over the SAME vocab/merges (its special
    token spellings differ; ids are identical by construction)."""
    from transformers import CLIPTokenizer as HFCLIPTokenizer

    d = tmp_path_factory.mktemp("hf")
    vocab = {t: i for t, i in tok.encoder.items()}
    sot, eot = vocab.pop("<start_of_text>"), vocab.pop("<end_of_text>")
    vocab["<|startoftext|>"], vocab["<|endoftext|>"] = sot, eot
    (d / "vocab.json").write_text(json.dumps(vocab))
    write_merges_file(MERGES, str(d / "merges.txt"), header="#version: 0.2")
    return HFCLIPTokenizer(str(d / "vocab.json"), str(d / "merges.txt"))


# Prompts where open_clip and transformers-without-ftfy tokenize identically
# (no contractions / accents / multi-char punctuation runs, where the HF
# BasicTokenizer fallback deviates from the open_clip reference behavior).
SAFE_PROMPTS = [
    "a photo of a cat",
    "the red dog and the cat",
    "CAT AND DOG",  # lowercasing
    "standing    in\tthe rain",  # whitespace cleanup
    "image at 1920, restored",
    "a (cat) [dog] photo.",
    "th cat catc catcat",  # partial merges, non-terminal </w> cases
    "zzz qqq unseen words",  # pure byte fallbacks
]


def test_hf_parity_token_for_token(tok, hf_tok):
    for prompt in SAFE_PROMPTS:
        ours = tok.encode(prompt)
        theirs = hf_tok(prompt, add_special_tokens=False)["input_ids"]
        assert ours == list(theirs), f"mismatch on {prompt!r}: {ours} vs {theirs}"


def test_hf_parity_full_context(tok, hf_tok):
    ids = tok(SAFE_PROMPTS, context_length=77)
    assert ids.shape == (len(SAFE_PROMPTS), 77)
    for i, prompt in enumerate(SAFE_PROMPTS):
        theirs = [tok.sot_token_id] + list(
            hf_tok(prompt, add_special_tokens=False)["input_ids"]
        ) + [tok.eot_token_id]
        np.testing.assert_array_equal(ids[i, : len(theirs)], theirs)
        assert (ids[i, len(theirs):] == 0).all()


def test_open_clip_specific_behaviors(tok):
    # contractions split as one pre-token ("'t"), byte-level
    ids_contraction = tok.encode("don't")
    assert ids_contraction == tok.encode("don") + tok.encode("'t")
    # multi-char punctuation stays one pre-token
    assert tok.encode("!!") != tok.encode("!") + tok.encode("!")
    # lowercase applied before matching
    assert tok.encode("The CAT") == tok.encode("the cat")


def test_truncation_forces_eot(tok):
    long_prompt = "cat " * 200
    ids = tok([long_prompt], context_length=77)[0]
    assert ids[0] == tok.sot_token_id
    assert ids[-1] == tok.eot_token_id
    assert (ids != 0).all()


def test_decode_roundtrip(tok):
    # NB digits pre-tokenize individually ([\p{N}] matches ONE digit), so each
    # carries its own </w> and "1920" decodes spaced — that is CLIP behavior,
    # so the roundtrip text is digit-free.
    text = "the cat and the red dog"
    assert tok.decode(tok.encode(text)).strip() == text


def test_byte_fallback_covers_all_bytes(tok):
    # any unicode input must tokenize (byte-level: no OOV possible)
    for s in ["日本語のテキスト", "emoji 🎉 works", "mixed £€¥ symbols"]:
        ids = tok.encode(s)
        assert len(ids) > 0
        assert all(0 <= i < tok.vocab_size for i in ids)


def test_full_scale_vocab_size(tmp_path):
    """With a 16e6-style oversized merge file, the default truncation must
    reproduce the CLIP vocab size of 49408 (the constant every published CLIP
    text tower's embedding matrix is built against)."""
    b2u = list(bytes_to_unicode().values())
    merges = []
    for a in b2u:
        for b in b2u:
            merges.append((a, b))
            if len(merges) >= DEFAULT_NUM_MERGES + 5000:  # oversized on purpose
                break
        else:
            continue
        break
    p = tmp_path / "big_merges.txt"
    write_merges_file(merges, str(p))
    tok = CLIPTokenizer(str(p))
    assert tok.vocab_size == 49408
    assert tok.sot_token_id == 49406 and tok.eot_token_id == 49407
