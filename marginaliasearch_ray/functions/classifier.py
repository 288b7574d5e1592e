"""classifier-net parity: the reference's single-hidden-layer neural
binary classifier, its vocabulary featureizer, and the NSFW filters that
consume them.

Reproduced semantics:

- ``BinaryClassifierModel`` (libraries/classifier-net/.../
  BinaryClassifierModel.java:17-494): z1 = W1·x + b1, a = ReLU(z1),
  y = sigmoid(w2·a + b2); BINARY inputs add w1 columns for each present
  feature, COUNTED inputs scale by the activation 1 - 2^(-count/2)
  (ClassifierSample.java:18-31); per-sample SGD backprop with
  cross-entropy loss clamped at 1e-14 (BinaryClassifierModel.java:
  228-307); training runs ``epochs`` passes with lr *= 0.98 every 100
  epochs (java:219-227); weights init from ``new Random(451)`` —
  He variance 2/N for the hidden layer, Glorot 2/(M+1) for the output
  (java:472-488) — replicated bit-for-bit via the Java LCG +
  Marsaglia-polar nextGaussian below.
- ``ClassifierVocabulary`` (ClassifierVocabulary.java:19-275): unigram
  + '_'-bigram vocabulary, ``trim_term`` strips leading/trailing
  non-alphanumerics, features are collected in INSERTION order (the
  fastutil IntArraySet behavior — float accumulation order follows it).
- ``BinaryClassifierTrainer`` (BinaryClassifierTrainer.java:20-190):
  ambiguous feature-sets (same Arrays.hashCode(x) seen >5 times as
  positive AND >5 as negative) drop their NEGATIVE samples; hidden size
  = n_training_samples // vocab_size.  Deviations (documented): the
  reference's train/verify split uses an UNSEEDED ``new Random()`` —
  irreproducible by construction — so we split by a deterministic md5
  rule; epoch count is a parameter (the gradle task uses 2000).
- ``NsfwDomainFilter`` (functions/nsfw-filter/.../NsfwDomainFilter.java:
  26-106): tiered domain block sets (1 = danger, 2 = smut, danger wins
  via INSERT IGNORE), ``isBlocked(id, tier)`` checks tier1 when the
  configured tier >= 1 and tier2 when >= 2.  List membership is a
  deterministic md5 rule in this build (the reference fetches published
  blocklists over HTTP — no network in scope).
- ``NsfwDocumentFilter`` (functions/nsfw-filter/.../NsfwDocumentFilter
  .java:23-109): isNsfw = model prediction > 0.5, false when no
  vocabulary features match.

Scale notes: training is sequential on the driver BY DESIGN — the
reference trains offline in one JVM (``./gradlew trainNsfwModel``) and
per-sample SGD has no bit-reproducible distributed form; the model is
small (vocab x hidden doubles) and broadcasts via ``ray.put``.  The
INFERENCE path is the distributed surface: a stateless actor-pool
``map_batches`` stage scoring documents against the broadcast model.
"""

from __future__ import annotations

import math
from hashlib import md5
from typing import Optional

import numpy as np

__all__ = [
    "JavaRandom",
    "trim_term",
    "ClassifierVocabulary",
    "BinaryClassifierModel",
    "prune_ambiguous",
    "train_binary_classifier",
    "synth_training_samples",
    "build_nsfw_vocabulary",
    "train_nsfw_model",
    "nsfw_domain_tier",
]

_MASK48 = (1 << 48) - 1


class JavaRandom:
    """java.util.Random: 48-bit LCG + Marsaglia-polar nextGaussian
    (the exact sequence ``initializeWeights`` consumes from seed 451)."""

    def __init__(self, seed: int):
        self._s = (seed ^ 0x5DEECE66D) & _MASK48
        self._next_g: Optional[float] = None

    def _next(self, bits: int) -> int:
        self._s = (self._s * 0x5DEECE66D + 0xB) & _MASK48
        r = self._s >> (48 - bits)
        if bits == 32 and r >= (1 << 31):  # signed int
            r -= 1 << 32
        return r

    def next_double(self) -> float:
        return ((self._next(26) << 27) + self._next(27)) * (2.0**-53)

    def next_gaussian(self) -> float:
        if self._next_g is not None:
            g, self._next_g = self._next_g, None
            return g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0 < s < 1:
                break
        m = math.sqrt(-2 * math.log(s) / s)
        self._next_g = v2 * m
        return v1 * m


def trim_term(term: str) -> str:
    """ClassifierVocabulary.trimTerm — strip leading/trailing chars that
    are neither alphabetic nor digits."""
    start, end = 0, len(term)
    while start < end and not (term[start].isalpha() or term[start].isdigit()):
        start += 1
    while end > start and not (term[end - 1].isalpha() or term[end - 1].isdigit()):
        end -= 1
    return term[start:end]


class ClassifierVocabulary:
    """Unigram + '_'-joined-bigram vocabulary; features preserve first-
    seen insertion order (prediction adds weight columns in that order)."""

    def __init__(self, terms: list[str]):
        self.vocabulary = list(terms)
        self.inv: dict[str, int] = {}
        self.bigrams: dict[str, dict[str, int]] = {}
        for i, t in enumerate(terms):
            if "_" not in t:
                self.inv[t] = i
            else:
                a, b = t.split("_", 1)
                self.bigrams.setdefault(a, {})[b] = i

    def __len__(self) -> int:
        return len(self.vocabulary)

    def features(self, *sentences: str) -> list[int]:
        feats: dict[int, None] = {}
        for sent in sentences:
            prev = None
            for term in sent.lower().split():
                term = trim_term(term)
                idx = self.inv.get(term)
                if idx is not None:
                    feats.setdefault(idx, None)
                b = self.bigrams.get(prev)
                if b is not None:
                    bi = b.get(term)
                    if bi is not None:
                        feats.setdefault(bi, None)
                prev = term
        return list(feats)

    def counted_features(self, *sentences: str) -> tuple[list[int], list[int]]:
        feats: dict[int, int] = {}
        for sent in sentences:
            prev = None
            for term in sent.lower().split():
                term = trim_term(term)
                idx = self.inv.get(term)
                if idx is not None:
                    feats[idx] = feats.get(idx, 0) + 1
                b = self.bigrams.get(prev)
                if b is not None:
                    bi = b.get(term)
                    if bi is not None:
                        feats[bi] = feats.get(bi, 0) + 1
                prev = term
        return list(feats), list(feats.values())


def activation_from_count(counts: list[int]) -> np.ndarray:
    return 1.0 - np.power(2.0, -np.asarray(counts, dtype=np.float64) / 2.0)


def _java_array_hash(x: list[int]) -> int:
    """Arrays.hashCode(int[]) with 32-bit wrap (the trainer's sample
    identity for ambiguity pruning)."""
    h = 1
    for v in x:
        h = (31 * h + v) & 0xFFFFFFFF
    if h >= 1 << 31:
        h -= 1 << 32
    return h


class BinaryClassifierModel:
    """Predict + per-sample SGD, float64, reduction orders fixed so the
    sequential replica and the distributed inference agree bitwise."""

    def __init__(self, n_inputs: int, m_hidden: int, mode: str = "BINARY"):
        self.n_inputs = n_inputs
        self.m_hidden = m_hidden
        self.mode = mode
        self.w1 = np.zeros((m_hidden, n_inputs), dtype=np.float64)
        self.b1 = np.zeros(m_hidden, dtype=np.float64)
        self.w2 = np.zeros(m_hidden, dtype=np.float64)
        self.b2 = 0.0

    @classmethod
    def for_training(
        cls, n_inputs: int, m_hidden: int, mode: str = "BINARY"
    ) -> "BinaryClassifierModel":
        model = cls(n_inputs, m_hidden, mode)
        rng = JavaRandom(451)
        hidden_scale = math.sqrt(2.0 / n_inputs)  # He (ReLU)
        for i in range(m_hidden):
            for j in range(n_inputs):
                model.w1[i, j] = rng.next_gaussian() * hidden_scale
        out_scale = math.sqrt(2.0 / (m_hidden + 1))  # Glorot (sigmoid)
        for i in range(m_hidden):
            model.w2[i] = rng.next_gaussian() * out_scale
        return model

    # -- forward pass (feature-insertion-order accumulation) --------------

    def _z1(self, x: list[int], act: Optional[np.ndarray]) -> np.ndarray:
        z1 = self.b1.copy()
        if act is None:
            for xi in x:
                z1 += self.w1[:, xi]
        else:
            for xi, a in zip(x, act):
                z1 += self.w1[:, xi] * a
        return z1

    def predict(self, x: list[int], act: Optional[np.ndarray] = None) -> float:
        z1 = self._z1(x, act)
        a = np.maximum(z1, 0.0)
        z2 = self.b2
        for h in range(self.m_hidden):  # the reference's ordered sum
            z2 += a[h] * self.w2[h]
        return 1.0 / (1.0 + math.exp(-z2))

    def is_nsfw(self, vocab: ClassifierVocabulary, *sentences: str) -> tuple[bool, float]:
        """NsfwDocumentFilter.isNsfw: False (score 0) when no features."""
        if self.mode == "BINARY":
            x = vocab.features(*sentences)
            if not x:
                return False, 0.0
            y = self.predict(x)
        else:
            x, counts = vocab.counted_features(*sentences)
            if not x:
                return False, 0.0
            y = self.predict(x, activation_from_count(counts))
        return y > 0.5, y

    # -- per-sample SGD ----------------------------------------------------

    def train_sample(
        self, y0: float, x: list[int], lr: float, act: Optional[np.ndarray] = None
    ) -> float:
        z1 = self._z1(x, act)
        a = np.maximum(z1, 0.0)
        z2 = self.b2
        for h in range(self.m_hidden):
            z2 += a[h] * self.w2[h]
        y = 1.0 / (1.0 + math.exp(-z2))

        eps = 1e-14
        yc = min(max(y, eps), 1 - eps)
        loss = -y0 * math.log(yc) - (1 - y0) * math.log(1 - yc)

        dl_dz2 = y - y0
        dldz1 = dl_dz2 * self.w2 * (z1 > 0.0)  # ReLU'
        xa = np.asarray(x, dtype=np.intp)
        if act is None:
            self.w1[:, xa] -= lr * dldz1[:, None]
        else:
            self.w1[:, xa] -= lr * dldz1[:, None] * act[None, :]
        self.b1 -= lr * dldz1
        self.w2 -= lr * dl_dz2 * a
        self.b2 -= lr * dl_dz2
        return loss

    def train(self, samples: list[tuple], epochs: int, lr: float) -> None:
        """samples: (y0, x, act-or-None); lr decays 0.98 every 100 epochs
        (BinaryClassifierModel.java:219-227)."""
        for i in range(epochs):
            for y0, x, act in samples:
                self.train_sample(y0, x, lr, act)
            if i > 0 and i % 100 == 0:
                lr *= 0.98


def prune_ambiguous(samples: list[tuple]) -> list[tuple]:
    """BinaryClassifierTrainer.readTrainingData ambiguity pruning: when
    one feature-set hash is seen >5 times positive AND >5 times negative,
    its NEGATIVE samples are dropped (java:118-145)."""
    pos: dict[int, int] = {}
    neg: dict[int, int] = {}
    hashes = [_java_array_hash(x) for _, x, _ in samples]
    for (y0, _, _), h in zip(samples, hashes):
        if y0 > 0.5:
            pos[h] = pos.get(h, 0) + 1
        else:
            neg[h] = neg.get(h, 0) + 1
    ambiguous = {h for h in pos if pos[h] > 5 and neg.get(h, 0) > 5}
    return [
        s
        for s, h in zip(samples, hashes)
        if not (s[0] < 0.5 and h in ambiguous)
    ]


def _md5_mod(s: str, mod: int) -> int:
    return int.from_bytes(md5(s.encode()).digest()[8:16], "little") % mod


def synth_training_samples(
    vocab: ClassifierVocabulary, n: int = 240, seed: str = "nsfw"
) -> list[tuple[str, bool]]:
    """Deterministic labeled training corpus over a given vocabulary:
    sample i is labeled positive when i is odd; its 6 words are drawn
    md5-deterministically, biased 5:1 toward the label's vocabulary half
    (positives from the upper half, negatives from the lower).  Every
    16th index emits one of two FIXED ambiguous texts with an
    alternating label so the trainer's prune path is exercised
    (>5 occurrences of the same feature hash on each side)."""
    terms = [t for t in vocab.vocabulary if "_" not in t]
    half = len(terms) // 2
    lo, hi = terms[:half], terms[half:]
    out: list[tuple[str, bool]] = []
    for i in range(n):
        if i % 16 == 0:
            # fixed ambiguous feature-set, label alternating per use
            out.append((f"{lo[0]} {hi[0]}", (i // 16) % 2 == 1))
            continue
        label = i % 2 == 1
        own, other = (hi, lo) if label else (lo, hi)
        words = []
        for k in range(6):
            pick_other = _md5_mod(f"{seed}|x|{i}|{k}", 6) == 0
            pool = other if pick_other else own
            words.append(pool[_md5_mod(f"{seed}|w|{i}|{k}", len(pool))])
        out.append((" ".join(words), label))
    return out


def train_binary_classifier(
    vocab: ClassifierVocabulary,
    labeled: list[tuple[str, bool]],
    *,
    epochs: int = 400,
    lr: float = 0.01,
    split_seed: str = "nsfw-split",
) -> BinaryClassifierModel:
    """BinaryClassifierTrainer.train over BINARY samples: featurize,
    drop empty samples, prune ambiguous negatives, 90/10 train/verify
    split (deterministic md5 rule standing in for the reference's
    unseeded Random), hidden size = n_train // vocab size, seeded init,
    SGD."""
    samples: list[tuple] = []
    for text, label in labeled:
        x = vocab.features(text)
        if not x:
            continue
        samples.append((1.0 if label else 0.0, x, None))
    samples = prune_ambiguous(samples)
    train = [
        s for i, s in enumerate(samples) if _md5_mod(f"{split_seed}|{i}", 10) != 0
    ]
    m_hidden = max(1, len(train) // max(1, len(vocab)))
    model = BinaryClassifierModel.for_training(len(vocab), m_hidden, "BINARY")
    model.train(train, epochs, lr)
    return model


def build_nsfw_vocabulary(top_tokens: list[str]) -> ClassifierVocabulary:
    """The fixture NSFW vocabulary: the ranked top corpus tokens plus two
    fixed bigrams over the four hottest tokens (exercising the bigram
    feature path on real adjacencies)."""
    terms = list(top_tokens)
    if len(terms) >= 4:
        terms.append(f"{terms[0]}_{terms[1]}")
        terms.append(f"{terms[2]}_{terms[3]}")
    return ClassifierVocabulary(terms)


def train_nsfw_model(vocab: ClassifierVocabulary) -> BinaryClassifierModel:
    """The deterministic NSFW document model: synthetic labeled corpus
    over the vocabulary + the seeded trainer (one protocol shared by the
    distributed pipeline and the sequential oracle replica)."""
    return train_binary_classifier(
        vocab, synth_training_samples(vocab, n=240), epochs=400, lr=0.01
    )


def nsfw_domain_tier(domain: str) -> int:
    """Deterministic NSFW_DOMAINS tier for a domain: danger-list
    membership (md5 % 16 == 0) wins tier 1 via INSERT IGNORE order,
    else smut-list membership (md5 % 8 == 0) gives tier 2, else 0."""
    if _md5_mod(f"{domain}|danger", 16) == 0:
        return 1
    if _md5_mod(f"{domain}|smut", 8) == 0:
        return 2
    return 0
