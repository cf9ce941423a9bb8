"""A plain-torch (no Lightning) replica of the reference ``TripletE2ENet``
for trajectory-parity testing (VERDICT r2 missing #1).

Reproduces the reference's exact step semantics from
`/root/reference/intrepppid/e2e/e2e_triplet.py:43-187` composed with the
encoder/head from `intrepppid/encoders/awd_lstm.py:23-155` and
`intrepppid/classifier/head/mlp.py:22-68`:

* embedding (padding_idx=0) -> 2-layer bidirectional ``nn.LSTM`` with
  hidden == embedding size -> ``bi_reduce`` over final hidden states ->
  ``Linear(E, E)`` (trailing Mish commented out in the reference),
* per-call dynamic truncation to the longest non-pad row
  (`awd_lstm.py:149-150`) — each of the five encoder calls truncates
  independently,
* head: pair mean -> Mish -> Linear(E, E/2) -> Mish -> Dropout -> Mish ->
  Dropout -> Linear(E/2, 1) (`mlp.py:35-66`),
* losses: ``TripletMarginLoss(margin=1.0, p=2)`` on anchor/positive/negative
  (optionally through ``triplet_projection = Mish -> Linear(E, E)``), BCE
  with logits on the pair, combined ``(1 - 1/beta)*classifier +
  (1/beta)*triplet`` (code semantics, `e2e_triplet.py:133-136`),
* the dead ``Projection`` MLP (`awd_lstm.py:140-142`): never called, but its
  parameters ride along in the optimizer exactly like the reference.

The stochastic mechanisms are DISABLED by default (the deterministic
trajectory tests pin the composition where RNG streams could never match
across frameworks), but the model-level three can be ENABLED with the
reference's exact semantics for the dropout-ON *distributional* parity
test (VERDICT r3 missing #3): embedding dropout (whole-vocab-row Bernoulli
mask scaled 1/(1-p), `intrepppid/utils/embedding_do.py:20-44`), DropConnect
on ``weight_hh_l0`` — the layer-0 FORWARD recurrent matrix only, redrawn
per encoder call (`intrepppid/utils/weightdrop.py:84-111`,
`encoders/awd_lstm.py:43-45`), and the head's DropConnect Linears plus
double Mish/Dropout (`classifier/head/mlp.py:35-63`). Subword sampling is
data-level and out of scope here.
"""
from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class TorchTripletReplica(nn.Module):
    def __init__(
        self,
        embedding_size: int = 16,
        vocab_size: int = 30,
        rnn_num_layers: int = 2,
        bi_reduce: str = "last",
        use_projection: bool = False,
        beta_classifier: float = 2.0,
        include_dead_projection: bool = True,
        embedding_droprate: float = 0.0,
        rnn_dropout_rate: float = 0.0,
        do_rate: float = 0.0,
    ):
        super().__init__()
        E = embedding_size
        self.bi_reduce = bi_reduce
        self.beta_classifier = beta_classifier
        self.embedding_droprate = embedding_droprate
        self.rnn_dropout_rate = rnn_dropout_rate
        self.do_rate = do_rate
        self.embedder = nn.Embedding(vocab_size, E, padding_idx=0)
        self.rnn = nn.LSTM(
            E, E, rnn_num_layers, bidirectional=True, batch_first=True
        )
        if rnn_dropout_rate > 0.0:
            # the reference's WeightDrop rewiring (weightdrop.py:65-79):
            # the raw matrix becomes the learnable parameter; each forward
            # re-installs a freshly dropped copy on the LSTM (torch >= 2
            # RNNBase rebuilds _flat_weights from attributes per forward)
            w = self.rnn.weight_hh_l0
            del self.rnn._parameters["weight_hh_l0"]
            self.weight_hh_l0_raw = nn.Parameter(w.data)
            self.rnn.weight_hh_l0 = w.data
        self.fc = nn.Linear(E, E)
        if include_dead_projection:
            # `Projection(E, 2E, 3)`: instantiated, never called
            d = (2 * E - E) // 3
            self.projection = nn.Sequential(
                nn.Linear(E, E + d),
                nn.ReLU(),
                nn.Linear(E + d, E + 2 * d),
                nn.ReLU(),
                nn.Linear(E + 2 * d, 2 * E),
            )
        self.fc1 = nn.Linear(E, E // 2)
        self.fc2 = nn.Linear(E // 2, 1)
        if use_projection:
            self.triplet_projection = nn.Sequential(nn.Mish(), nn.Linear(E, E))
        self.mish = nn.Mish()

    def encode(self, x: torch.Tensor) -> torch.Tensor:
        # dynamic truncation to the longest non-pad row, per call
        max_len = int(torch.max(torch.sum(x != 0, dim=1)))
        x = x[:, :max_len]
        if self.training and self.embedding_droprate > 0.0:
            # embedding_do.py:20-44 — Bernoulli mask over vocab ROWS,
            # scaled 1/(1-p); padding row handled by F.embedding
            p = self.embedding_droprate
            mask = self.embedder.weight.new_empty(
                (self.embedder.weight.size(0), 1)
            ).bernoulli_(1 - p) / (1 - p)
            e = F.embedding(
                x, mask * self.embedder.weight, padding_idx=0
            )
        else:
            e = self.embedder(x)
        if self.rnn_dropout_rate > 0.0:
            # fresh DropConnect mask per encoder call (weightdrop.py:84-111)
            w = F.dropout(
                self.weight_hh_l0_raw, self.rnn_dropout_rate, self.training
            )
            if isinstance(w, torch.nn.Parameter):
                # eval: F.dropout returns its input unchanged; assigning the
                # raw Parameter would re-register it under weight_hh_l0 and
                # make the NEXT train-mode assignment raise TypeError
                w = w * 1.0
            self.rnn.weight_hh_l0 = w
        _, (hn, _) = self.rnn(e)
        if self.bi_reduce == "max":
            z = torch.max(hn[-2:], dim=0).values
        elif self.bi_reduce == "mean":
            z = torch.mean(hn[-2:], dim=0)
        else:  # "last": reverse-direction final state only (Appendix A #5)
            z = hn[-1]
        return self.fc(z)

    def head(self, z1: torch.Tensor, z2: torch.Tensor) -> torch.Tensor:
        x = (z1 + z2) / 2
        x = self.mish(x)
        if self.do_rate > 0.0:
            # mlp.py:35-63 — DropConnect Linear weights + the double
            # Mish/Dropout quirk (Appendix A #8); biases undropped
            p, training = self.do_rate, self.training
            x = F.linear(
                x, F.dropout(self.fc1.weight, p, training), self.fc1.bias
            )
            x = F.dropout(self.mish(x), p, training)
            x = F.dropout(self.mish(x), p, training)
            return F.linear(
                x, F.dropout(self.fc2.weight, p, training), self.fc2.bias
            )
        x = self.fc1(x)
        x = self.mish(self.mish(x))  # Dropout(p) between/after is disabled
        return self.fc2(x)

    def step_loss(self, batch):
        """One reference-semantics step on a dict batch of int64 tensors.

        Returns (loss, logits, classifier_loss, triplet_loss)."""
        z_a = self.encode(batch["anchor"])
        z_p = self.encode(batch["positive"])
        z_n = self.encode(batch["negative"])
        if hasattr(self, "triplet_projection"):
            z_a = self.triplet_projection(z_a)
            z_p = self.triplet_projection(z_p)
            z_n = self.triplet_projection(z_n)
        triplet = F.triplet_margin_loss(z_a, z_p, z_n, margin=1.0, p=2)
        logits = self.head(
            self.encode(batch["p1"]), self.encode(batch["p2"])
        ).squeeze(-1)
        bce = F.binary_cross_entropy_with_logits(
            logits, batch["label"].float()
        )
        inv_beta = 1.0 / self.beta_classifier
        loss = (1.0 - inv_beta) * bce + inv_beta * triplet
        return loss, logits, bce, triplet

    def reference_state_dict(self):
        """This module's weights under the reference's Lightning state_dict
        key layout (WeightDrop's ``*_raw`` renames included), consumable by
        ``torch_state_dict_to_params``."""
        out = {}
        for k, v in self.state_dict().items():
            if k == "weight_hh_l0_raw":
                out["encoder.encoder.rnn.weight_hh_l0_raw"] = v
                continue
            if k.startswith("embedder."):
                out["encoder." + k] = v
            elif k.startswith("rnn."):
                name = k[len("rnn."):]
                if name == "weight_hh_l0":
                    name = "weight_hh_l0_raw"  # the weight-dropped matrix
                out["encoder.encoder.rnn." + name] = v
            elif k.startswith("fc."):
                out["encoder.encoder." + k] = v
            elif k.startswith("projection."):
                out["encoder.projection.model." + k[len("projection."):]] = v
            elif k.startswith("fc1."):
                name = k[len("fc1."):]
                name = "weight_raw" if name == "weight" else name
                out["head.classify.fc1.module." + name] = v
            elif k.startswith("fc2."):
                name = k[len("fc2."):]
                name = "weight_raw" if name == "weight" else name
                out["head.classify.fc2.module." + name] = v
            else:  # triplet_projection.1.*
                out[k] = v
        return out
