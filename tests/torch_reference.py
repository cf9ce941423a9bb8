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

All four stochastic mechanisms (embedding dropout, DropConnect weight drop,
activation dropout, subword sampling) are DISABLED — the replica exists to
pin the deterministic composition over many training steps, where the RNG
streams could never match across frameworks anyway.
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
    ):
        super().__init__()
        E = embedding_size
        self.bi_reduce = bi_reduce
        self.beta_classifier = beta_classifier
        self.embedder = nn.Embedding(vocab_size, E, padding_idx=0)
        self.rnn = nn.LSTM(
            E, E, rnn_num_layers, bidirectional=True, batch_first=True
        )
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
        e = self.embedder(x)
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
