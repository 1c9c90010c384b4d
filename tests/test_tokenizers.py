"""Golden tests: standalone tokenizers vs the HF `tokenizers` runtime and
transformers' pure-Python CLIPTokenizer, over synthetic vocabularies built
in-memory (real vocab files are user-supplied at runtime, like weights)."""

import json
import random
import string

import pytest

from lanpaint_tpu import tokenizers as tk

hf_tokenizers = pytest.importorskip("tokenizers")


# --------------------------------------------------------------------------
# helpers: build a small but non-trivial byte-level BPE vocab by actually
# training one with the HF runtime, then compare encodings


CORPUS = [
    "a photo of a cat sitting on a mat",
    "the quick brown fox jumps over the lazy dog",
    "An astronaut riding a horse in photorealistic style!",
    "masterpiece, best quality, 4k, highly detailed",
    "inpaint the masked region seamlessly...",
    "TPU v5e systolic arrays multiply matrices",
    "hello   world  with   extra spaces",
    "punctuation: commas, periods. and (brackets) [too]",
    "numbers 123 456 7890 and mixed a1b2c3",
    "unicode café naïve über",
]

PROBES = CORPUS + [
    "",
    "a",
    " leading and trailing ",
    "UPPER lower MiXeD",
    "word",
    "!!!",
    "12345",
    "don't you've we'll it's",
]


def _train_bpe(vocab_size=400, ignore_merges=False):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(ignore_merges=ignore_merges))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=["<|end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(CORPUS * 4, trainer)
    return tok


def test_bpe_golden_bytelevel():
    hf = _train_bpe()
    mine = tk.from_tokenizer_dict(json.loads(hf.to_str()))
    for text in PROBES:
        assert mine.encode(text) == hf.encode(text).ids, repr(text)


def test_bpe_golden_ignore_merges_and_added_tokens():
    hf = _train_bpe(ignore_merges=True)
    hf.add_special_tokens(["<|image_pad|>", "<|im_start|>"])
    mine = tk.from_tokenizer_dict(json.loads(hf.to_str()))
    probes = PROBES + [
        "<|im_start|>a photo of a cat<|end|>",
        "before <|image_pad|> after",
    ]
    for text in probes:
        assert mine.encode(text) == hf.encode(text).ids, repr(text)


def test_bpe_golden_llama3_style_split_pattern():
    """Split(Regex) pre-tokenizer (the Llama-3/Qwen2 layout)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    pat = (r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}|"
           r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+")
    tok = Tokenizer(models.BPE(ignore_merges=True))
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(hf_tokenizers.Regex(pat), behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    trainer = trainers.BpeTrainer(
        vocab_size=420, special_tokens=[],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(CORPUS * 4, trainer)
    mine = tk.from_tokenizer_dict(json.loads(tok.to_str()))
    for text in PROBES:
        assert mine.encode(text) == tok.encode(text).ids, repr(text)


# --------------------------------------------------------------------------
# Unigram


def _train_unigram(vocab_size=300, byte_fallback=False):
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, trainers

    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.Sequence([
        normalizers.NFKC(),
        normalizers.Replace(hf_tokenizers.Regex(r"\s+"), " "),
        normalizers.Strip(),
    ])
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always")
    trainer = trainers.UnigramTrainer(
        vocab_size=vocab_size, special_tokens=["<pad>", "</s>", "<unk>"],
        unk_token="<unk>")
    tok.train_from_iterator(CORPUS * 4, trainer)
    return tok


def test_unigram_golden():
    hf = _train_unigram()
    mine = tk.from_tokenizer_dict(json.loads(hf.to_str()))
    mine.eos_token_id = None
    for text in PROBES:
        if not text.strip():
            continue
        assert mine.encode(text, add_eos=False) == hf.encode(text).ids, repr(text)


def test_unigram_eos_truncate_pad():
    hf = _train_unigram()
    mine = tk.from_tokenizer_dict(json.loads(hf.to_str()))
    mine.eos_token_id = 1
    ids = mine.encode("a photo of a cat", max_length=8, pad_to=12, pad_id=0)
    assert len(ids) == 12
    assert ids[-5] == 0 or ids[7] == 1  # padded or truncated-with-eos


# --------------------------------------------------------------------------
# CLIP BPE vs transformers' pure-Python CLIPTokenizer over a tiny trained
# vocab written to disk in CLIP's vocab.json/merges.txt format


def _make_clip_files(tmp_path):
    """Derive a CLIP-style (</w>-marked) vocab from the corpus by training a
    byte-level-free BPE on whitespace-split words."""
    # collect words as char sequences with </w> terminal
    words = {}
    for line in CORPUS:
        for w in line.lower().split():
            words[w] = words.get(w, 0) + 1
    byte_enc = tk.bytes_to_unicode()

    def to_syms(w):
        s = [byte_enc[b] for b in w.encode("utf-8")]
        return s[:-1] + [s[-1] + "</w>"]

    vocab = {ch: i for i, ch in enumerate(sorted(byte_enc.values()))}
    for ch in sorted(byte_enc.values()):
        vocab[ch + "</w>"] = len(vocab)
    merges = []
    seqs = {w: to_syms(w) for w in words}
    for _ in range(120):  # greedy merge training
        pairs = {}
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + words[w]
        if not pairs:
            break
        (a, b), _n = max(pairs.items(), key=lambda kv: kv[1])
        merges.append((a, b))
        new = a + b
        if new not in vocab:
            vocab[new] = len(vocab)
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(new)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vp = tmp_path / "vocab.json"
    mp = tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab), encoding="utf-8")
    mp.write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges),
                  encoding="utf-8")
    return str(vp), str(mp), vocab


def test_clip_bpe_golden(tmp_path):
    transformers = pytest.importorskip("transformers")
    vp, mp, vocab = _make_clip_files(tmp_path)
    hf = transformers.CLIPTokenizer(vp, mp)
    mine = tk.ClipBpeTokenizer.from_files(
        vp, mp, bos_token_id=vocab["<|startoftext|>"],
        eos_token_id=vocab["<|endoftext|>"], context_length=77)
    for text in PROBES:
        ref = hf([text], padding="max_length", max_length=77,
                 truncation=True)["input_ids"][0]
        assert mine.encode(text) == ref, repr(text)


def test_clip_bpe_truncation(tmp_path):
    transformers = pytest.importorskip("transformers")
    vp, mp, vocab = _make_clip_files(tmp_path)
    hf = transformers.CLIPTokenizer(vp, mp)
    mine = tk.ClipBpeTokenizer.from_files(
        vp, mp, bos_token_id=vocab["<|startoftext|>"],
        eos_token_id=vocab["<|endoftext|>"], context_length=77)
    long = " ".join(random.Random(0).choices(
        ["cat", "dog", "fox", "mat", "x7", "café", "!?"], k=200))
    ref = hf([long], padding="max_length", max_length=77,
             truncation=True)["input_ids"][0]
    assert mine.encode(long) == ref


# --------------------------------------------------------------------------
# sentencepiece .model protobuf reader (synthetic message)


def test_spiece_protobuf_reader(tmp_path):
    import struct

    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def piece(p, score, ptype=None):
        body = b"\x0a" + varint(len(p.encode())) + p.encode()
        body += b"\x15" + struct.pack("<f", score)
        if ptype is not None:
            body += b"\x18" + varint(ptype)
        return b"\x0a" + varint(len(body)) + body

    msg = (piece("<pad>", 0.0, 3) + piece("<unk>", 0.0, 2)
           + piece("▁the", -1.5) + piece("▁cat", -2.0)
           + piece("▁", -3.0) + piece("<0x41>", -20.0, 6))
    # trailing unknown field (e.g. trainer_spec) must be skipped
    msg += b"\x12" + varint(3) + b"abc"
    f = tmp_path / "spiece.model"
    f.write_bytes(msg)
    pieces = tk.load_sentencepiece_model(str(f))
    assert pieces == [("<pad>", 0.0, 3), ("<unk>", 0.0, 2),
                      ("▁the", -1.5, 1), ("▁cat", -2.0, 1),
                      ("▁", -3.0, 1), ("<0x41>", -20.0, 6)]
    uni = tk.unigram_from_sentencepiece(str(f), eos_token_id=None)
    assert uni.unk_id == 1
    assert uni.byte_fallback
    ids = uni.encode("the cat", add_eos=False)
    assert ids == [2, 3]
    # byte fallback for unknown char 'A' ("▁A" -> ["▁", <0x41>])
    ids = uni.encode("A", add_eos=False)
    assert ids == [4, 5]


def test_clip_special_chars_no_crash():
    # no vocab file: direct construction over the byte alphabet
    byte_enc = tk.bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(sorted(byte_enc.values()))}
    for ch in sorted(byte_enc.values()):
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    t = tk.ClipBpeTokenizer(vocab, [], bos_token_id=vocab["<|startoftext|>"],
                            eos_token_id=vocab["<|endoftext|>"])
    ids = t.encode("éé smiling \U0001f600 face")
    assert len(ids) == 77
