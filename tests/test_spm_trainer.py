"""From-scratch unigram trainer (`data/spm/trainer.py`): vocabulary
contract, EM objective, engine round trips, determinism, and family
agreement with HuggingFace tokenizers' independent Rust UnigramTrainer
(the same oracle that pins the encoders, `tests/test_tokenizer_golden.py`).
"""
import json

import numpy as np
import pytest

AA = "ACDEFGHIKLMNPQRSTVWY"
MOTIFS = ["MKVLGA", "GGSGGS", "AAKEE", "PQRST"]
VOCAB = 80


def _corpus(rng, n=120, min_len=20, max_len=160):
    seqs = []
    for _ in range(n):
        L = int(rng.integers(min_len, max_len))
        chars = list(rng.choice(list(AA), size=L))
        for _ in range(max(2, L // 25)):
            m = MOTIFS[int(rng.integers(len(MOTIFS)))]
            pos = int(rng.integers(0, max(1, L - len(m))))
            chars[pos : pos + len(m)] = list(m)
        seqs.append("".join(chars[:L]))
    return seqs


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from intrepppid_tpu.data.spm.proto import save_model
    from intrepppid_tpu.data.spm.trainer import (
        TrainerConfig,
        train_unigram_model,
    )

    rng = np.random.default_rng(99)
    corpus = _corpus(rng)
    cfg = TrainerConfig(
        vocab_size=VOCAB, max_piece_len=8, seed_size=2000, max_rounds=12
    )
    model, result = train_unigram_model(corpus, cfg)
    path = tmp_path_factory.mktemp("spm") / "trained.model"
    save_model(model, path)
    return corpus, cfg, model, result, path


def test_vocab_contract(trained):
    corpus, cfg, model, result, _ = trained
    assert len(model.pieces) == VOCAB
    pieces = {e.piece for e in model.pieces}
    # full single-character coverage of the corpus alphabet
    alphabet = {c for s in corpus for c in s}
    assert alphabet <= pieces
    normal = [e for e in model.pieces if e.piece not in ("<unk>", "<s>", "</s>")]
    multis = [e.piece for e in normal if len(e.piece) > 1]
    assert len(multis) >= 10  # the planted motifs force multi-char pieces
    # some planted motif (or a >=3-char chunk of one) must be discovered
    found = any(
        m[i : i + k] in pieces
        for m in MOTIFS
        for k in range(3, len(m) + 1)
        for i in range(len(m) - k + 1)
    )
    assert found
    # scores are a normalized log-probability distribution
    logz = np.logaddexp.reduce([e.score for e in normal])
    assert abs(logz) < 1e-6


def test_em_objective_improves(trained):
    _, _, _, result, _ = trained
    assert len(result.objectives) >= 2
    assert result.objectives[-1] > result.objectives[0]


def test_round_trip_both_engines(trained):
    from intrepppid_tpu.data.spm.unigram import UnigramTokenizer
    from intrepppid_tpu.data.tokenizer import SentencePieceTokenizer

    corpus, _, model, _, path = trained
    py = UnigramTokenizer.from_file(path)
    nat = SentencePieceTokenizer(path)
    for s in corpus[:20]:
        ids_py = py.encode(s)
        ids_nat = nat.encode(s)
        assert ids_py == list(ids_nat)
        assert all(i >= 3 for i in ids_py)  # full coverage: never <unk>
        assert "".join(py.id_to_piece(i) for i in ids_py) == s


def test_determinism(trained, tmp_path):
    from intrepppid_tpu.data.spm.proto import serialize_model
    from intrepppid_tpu.data.spm.trainer import train_unigram_model

    corpus, cfg, model, _, _ = trained
    model2, _ = train_unigram_model(corpus, cfg)
    assert serialize_model(model) == serialize_model(model2)


def test_family_agreement_with_hf_rust_trainer(trained):
    """Same corpus, same vocab size: our trainer and HF's independent Rust
    UnigramTrainer must land in the same model family — large multi-char
    vocabulary overlap and similar segmentation granularity. (Exact piece
    parity is NOT expected: seeding and tie-breaks differ even between
    sentencepiece and HF.)"""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram
    from tokenizers.trainers import UnigramTrainer

    from intrepppid_tpu.data.spm.unigram import UnigramTokenizer

    corpus, _, model, _, path = trained
    tok = Tokenizer(Unigram())
    trainer = UnigramTrainer(
        vocab_size=VOCAB,
        special_tokens=["<unk>", "<s>", "</s>"],
        unk_token="<unk>",
        initial_alphabet=list(AA),
        max_piece_length=8,
        shrinking_factor=0.75,
        n_sub_iterations=2,
    )
    tok.train_from_iterator(corpus, trainer=trainer)
    hf_vocab = {p for p, _ in json.loads(tok.to_str())["model"]["vocab"]}
    hf_multis = {p for p in hf_vocab if len(p) > 1}
    our_multis = {e.piece for e in model.pieces if len(e.piece) > 1}
    assert hf_multis and our_multis
    overlap = len(our_multis & hf_multis) / len(our_multis)
    assert overlap >= 0.4, (
        f"only {overlap:.0%} of our multi-char pieces appear in the HF "
        f"vocab: ours={sorted(our_multis)} hf={sorted(hf_multis)}"
    )
    # segmentation granularity: mean tokens per sequence within 20%
    py = UnigramTokenizer.from_file(path)
    ours = np.mean([len(py.encode(s)) for s in corpus[:40]])
    hf = np.mean(
        [len(tok.encode(s, add_special_tokens=False).ids) for s in corpus[:40]]
    )
    assert abs(ours - hf) / hf < 0.2, (ours, hf)


def test_train_spm_cli(trained, tmp_path):
    from intrepppid_tpu.cli.data import Data
    from intrepppid_tpu.data.tokenizer import SentencePieceTokenizer

    corpus, _, _, _, _ = trained
    inp = tmp_path / "corpus.txt"
    inp.write_text("\n".join(corpus[:60]) + "\n")
    out = tmp_path / "cli.model"
    summary = Data.train_spm(
        input_path=inp, out_path=out, vocab_size=60, max_piece_len=6,
        seed_size=1000, max_rounds=8,
    )
    assert summary["vocab_size"] == 60
    assert summary["n_multi_char_pieces"] >= 5
    spp = SentencePieceTokenizer(out)
    ids = spp.encode(corpus[0])
    assert len(ids) > 0 and all(i >= 3 for i in ids)