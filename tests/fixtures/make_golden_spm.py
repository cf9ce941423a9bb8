"""Generate independent golden fixtures for the tokenizer stack.

The reference's token stream comes from the real SentencePiece C++ library
(`intrepppid/data/ppi_oma.py:313,375`). That library is not available in
this image, so the independent oracle here is HuggingFace ``tokenizers``
(Rust): its ``UnigramTrainer`` trains a real unigram LM on a synthetic
protein corpus, and its Viterbi decoder produces the golden token ids.
Neither shares a line of code with intrepppid_tpu's engines, so agreement
is meaningful.

Outputs (committed, regenerated only if missing):

* ``golden_spm.model``  — the trained vocab written as a SentencePiece
  protobuf, deliberately decorated with real-world fields our encoder must
  tolerate: BYTE-type pieces (byte-fallback models), a
  ``precompiled_charsmap`` blob in the normalizer spec, and unknown fields
  (trainer_spec extras, top-level self_test_data) that the parser must skip.
* ``golden_spm.json``   — {sequences, ids (HF Viterbi), vocab} goldens.
"""
import json
import struct
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
sys.path.insert(0, str(HERE.parent.parent))

from intrepppid_tpu.data.spm.proto import (  # noqa: E402
    BYTE,
    CONTROL,
    NORMAL,
    UNKNOWN,
    NormalizerSpec,
    SentencePieceEntry,
    SpmModel,
    _field,
    _write_varint,
    serialize_model,
)

AA = "ACDEFGHIKLMNPQRSTVWY"
# approximate UniProt amino-acid frequencies
AA_P = np.array(
    [8.3, 1.4, 5.5, 6.7, 3.9, 7.1, 2.3, 5.9, 5.8, 9.7,
     2.4, 4.1, 4.7, 3.9, 5.5, 6.6, 5.4, 6.9, 1.1, 2.9]
)
AA_P = AA_P / AA_P.sum()


def synth_corpus(rng, n, min_len=20, max_len=600):
    seqs = []
    motifs = ["".join(rng.choice(list(AA), size=rng.integers(3, 8))) for _ in range(30)]
    for _ in range(n):
        L = int(rng.integers(min_len, max_len))
        chars = list(rng.choice(list(AA), size=L, p=AA_P))
        # inject repeated motifs so the trainer learns multi-char pieces
        for _ in range(max(1, L // 40)):
            m = motifs[int(rng.integers(len(motifs)))]
            pos = int(rng.integers(0, max(1, L - len(m))))
            chars[pos:pos + len(m)] = list(m)
        seqs.append("".join(chars[:L]))
    return seqs


def main():
    model_path = HERE / "golden_spm.model"
    json_path = HERE / "golden_spm.json"
    if model_path.exists() and json_path.exists():
        print("golden fixtures exist")
        return

    from tokenizers import Tokenizer
    from tokenizers.models import Unigram
    from tokenizers.trainers import UnigramTrainer

    rng = np.random.default_rng(20260816)
    train_corpus = synth_corpus(rng, 600)
    eval_seqs = synth_corpus(rng, 110)
    # edge cases: single chars, short runs, homopolymers, motif-only strings
    eval_seqs += ["A", "M", "AAAAAAAAAA", "MKVL", "GGGGSGGGGS" * 3]

    tok = Tokenizer(Unigram())
    trainer = UnigramTrainer(
        vocab_size=250,
        special_tokens=["<unk>", "<s>", "</s>"],
        unk_token="<unk>",
        initial_alphabet=list(AA),
        shrinking_factor=0.75,
        n_sub_iterations=2,
    )
    tok.train_from_iterator(train_corpus, trainer=trainer)

    spec = json.loads(tok.to_str())
    assert spec["model"]["type"] == "Unigram"
    vocab = spec["model"]["vocab"]  # [[piece, score], ...] in id order
    unk_id = spec["model"]["unk_id"]
    assert unk_id == 0, unk_id
    covered = {p for p, _ in vocab}
    missing = [c for c in AA if c not in covered]
    assert not missing, f"alphabet not covered: {missing}"

    # golden encodings from the HF Rust Viterbi decoder, raw (no normalizer,
    # no pretokenizer, no special tokens)
    golden_ids = [tok.encode(s, add_special_tokens=False).ids for s in eval_seqs]
    used = {i for ids in golden_ids for i in ids}
    assert all(i >= 3 for i in used), "oracle must never emit specials"

    # ---- write the .model with real-world decorations ---------------------
    pieces = []
    for i, (piece, score) in enumerate(vocab):
        if i == 0:
            pieces.append(SentencePieceEntry("<unk>", 0.0, UNKNOWN))
        elif i in (1, 2):
            pieces.append(SentencePieceEntry(piece, 0.0, CONTROL))
        else:
            pieces.append(SentencePieceEntry(piece, float(score), NORMAL))
    # byte-fallback pieces appended at the end (ids shift nothing above)
    for b in range(8):
        pieces.append(SentencePieceEntry(f"<0x{b:02X}>", 0.0, BYTE))

    model = SpmModel(
        pieces=pieces,
        unk_id=0,
        bos_id=1,
        eos_id=2,
        pad_id=-1,
        normalizer=NormalizerSpec(
            name="identity",
            add_dummy_prefix=False,
            remove_extra_whitespaces=False,
            escape_whitespaces=False,
        ),
    )
    blob = serialize_model(model)

    # splice in fields a real sentencepiece model carries: a VALID
    # normalizer_spec.precompiled_charsmap (field 2 — rules that never
    # touch the amino-acid alphabet, so goldens are unaffected but the
    # exact charsmap path is exercised end-to-end), junk in an unknown
    # normalizer field (15) the parser must skip, extra trainer_spec
    # fields, and top-level self_test_data (field 4) + denormalizer_spec
    # (field 5).
    from make_charsmap import build_charsmap

    charsmap = build_charsmap({b"\t": b" ", "　".encode(): b" "})
    junk = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
    extra_norm = _field(2, 2, _write_varint(len(charsmap)) + charsmap)
    extra_norm += _field(15, 2, _write_varint(len(junk)) + junk)
    norm_body = (
        _field(1, 2, _write_varint(len(b"identity")) + b"identity")
        + extra_norm
        + _field(3, 0, _write_varint(0))
        + _field(4, 0, _write_varint(0))
        + _field(5, 0, _write_varint(0))
    )
    # rebuild: strip the writer's normalizer (field 3) and append ours + extras
    base = serialize_model(
        SpmModel(pieces=pieces, unk_id=0, bos_id=1, eos_id=2, pad_id=-1)
    )
    # the writer emits normalizer last; cut it off by re-serializing without it
    from intrepppid_tpu.data.spm.proto import _iter_fields

    out = b""
    for fnum, wtype, val in _iter_fields(base):
        if fnum == 3:
            continue
        assert wtype == 2
        out += _field(fnum, 2, _write_varint(len(val)) + val)
    trainer_extra = (
        _field(1, 2, _write_varint(5) + b"dummy")      # input
        + _field(7, 0, _write_varint(250))             # vocab_size
        + _field(40, 0, _write_varint(0))
        + _field(41, 0, _write_varint(1))
        + _field(42, 0, _write_varint(2))
        + _field(43, 0, _write_varint((1 << 64) - 1))  # pad_id=-1
        + _field(35, 5, struct.pack("<f", 0.9995))     # character_coverage
    )
    # replace trainer_spec (field 2) wholesale with the decorated one
    out2 = b""
    for fnum, wtype, val in _iter_fields(out):
        if fnum == 2:
            out2 += _field(2, 2, _write_varint(len(trainer_extra)) + trainer_extra)
        else:
            out2 += _field(fnum, 2, _write_varint(len(val)) + val)
    out2 += _field(3, 2, _write_varint(len(norm_body)) + norm_body)
    out2 += _field(4, 2, _write_varint(4) + b"\x0a\x02hi")  # self_test_data
    out2 += _field(5, 2, _write_varint(0))                  # denormalizer_spec
    model_path.write_bytes(out2)

    json_path.write_text(json.dumps({
        "sequences": eval_seqs,
        "ids": golden_ids,
        "vocab": vocab,
        "unk_id": unk_id,
        "n_byte_pieces": 8,
    }))
    print(f"wrote {model_path} ({len(out2)} bytes), "
          f"{len(eval_seqs)} golden encodings, vocab {len(vocab)}")


def make_bytefallback_fixture():
    """A byte_fallback=true model (all 256 BYTE pieces) + HF-Rust golden
    encodings of OOV-bearing strings (VERDICT r2 missing #3).

    Vocab = the committed golden model's pieces with the 256 byte pieces
    appended, so ids 0..n-1 match golden_spm.model; the oracle is HF
    ``tokenizers``' Unigram decoder with ``byte_fallback=True`` — the same
    output-time substitution sentencepiece performs."""
    model_path = HERE / "golden_bytefallback.model"
    json_path = HERE / "golden_bytefallback.json"
    if model_path.exists() and json_path.exists():
        print("byte-fallback fixtures exist")
        return

    from tokenizers import Tokenizer
    from tokenizers.models import Unigram

    from intrepppid_tpu.data.spm.proto import load_model

    base = load_model(HERE / "golden_spm.model")
    normal = [
        (p.piece, float(p.score))
        for p in base.pieces
        if p.type not in (CONTROL, UNKNOWN, BYTE)
    ]
    n_base = 3 + len(normal)  # unk, <s>, </s>, then normal pieces

    hf_vocab = (
        [("<unk>", 0.0), ("<s>", 0.0), ("</s>", 0.0)]
        + normal
        + [(f"<0x{b:02X}>", 0.0) for b in range(256)]
    )
    tok = Tokenizer(Unigram(hf_vocab, 0, True))

    # OOV-bearing strings: ASCII OOV, multi-byte UTF-8 (2/3/4 bytes), OOV at
    # start/middle/end, pure-OOV runs, and clean in-vocab controls
    seqs = [
        "MKVLz",                  # ASCII OOV at end
        "zMKVL",                  # at start
        "MKzVL",                  # in the middle
        "MKV9LQ",                 # digit
        "MKéVL",             # é: 2-byte UTF-8
        "MKV中LQ",            # CJK: 3 bytes
        "MK\U0001f642VL",         # emoji: 4 bytes
        "z9é",               # pure OOV run
        "MKVLQAGE",               # no OOV at all (ids must match base model)
        "é",                 # single multi-byte OOV
    ]
    golden = [tok.encode(s, add_special_tokens=False).ids for s in seqs]

    pieces = []
    for i, p in enumerate(base.pieces):
        if p.type == BYTE:
            continue  # drop the 8 decoration bytes; full set appended below
        pieces.append(SentencePieceEntry(p.piece, p.score, p.type))
    assert len(pieces) == n_base
    for b in range(256):
        pieces.append(SentencePieceEntry(f"<0x{b:02X}>", 0.0, BYTE))

    model = SpmModel(
        pieces=pieces,
        unk_id=0,
        bos_id=1,
        eos_id=2,
        pad_id=-1,
        normalizer=NormalizerSpec(
            name="identity",
            add_dummy_prefix=False,
            remove_extra_whitespaces=False,
            escape_whitespaces=False,
        ),
    )
    model_path.write_bytes(serialize_model(model))
    json_path.write_text(json.dumps({
        "sequences": seqs,
        "ids": golden,
        "n_base": n_base,
    }))
    print(f"wrote {model_path}, {len(seqs)} byte-fallback goldens")


if __name__ == "__main__":
    main()
    make_bytefallback_fixture()
