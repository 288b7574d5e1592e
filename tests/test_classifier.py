"""classifier-net conformance (libraries/classifier-net/*.java):
JavaRandom sequence parity, model forward/backward math, vocabulary
featureization, trainer pruning, NSFW wrappers."""

import math

import numpy as np
import pytest

from marginaliasearch_ray.functions.classifier import (
    BinaryClassifierModel,
    ClassifierVocabulary,
    JavaRandom,
    activation_from_count,
    build_nsfw_vocabulary,
    nsfw_domain_tier,
    prune_ambiguous,
    synth_training_samples,
    train_binary_classifier,
    trim_term,
)


def test_java_random_known_vectors():
    # canonical java.util.Random values (published/reproducible facts of
    # the 48-bit LCG spec)
    r = JavaRandom(0)
    assert r._next(32) == -1155484576  # new Random(0).nextInt()
    r = JavaRandom(42)
    assert r._next(32) == -1170105035
    r = JavaRandom(0)
    assert abs(r.next_gaussian() - 0.8025330637390305) < 1e-15
    # second draw comes from the cached polar pair
    assert abs(r.next_gaussian() - (-0.9015460884175122)) < 1e-15


def test_trim_term():
    assert trim_term("--hello!!") == "hello"
    assert trim_term("a") == "a"
    assert trim_term("...") == ""
    assert trim_term("3.5") == "3.5"  # inner punctuation survives
    assert trim_term("") == ""


def test_vocabulary_features_order_and_bigrams():
    v = ClassifierVocabulary(["red", "blue", "red_blue", "green"])
    # insertion order per term: unigram first, then the bigram it closes
    # (ClassifierVocabulary.java:94-104)
    assert v.features("Red blue!") == [0, 1, 2]
    assert v.features("blue red") == [1, 0]  # no blue_red bigram
    assert v.features("nothing here") == []
    x, c = v.counted_features("red red blue")
    # red x2, blue x1, plus the red_blue bigram the last pair closes
    assert x == [0, 1, 2] and c == [2, 1, 1]


def test_activation_from_count():
    # cnt 1 -> 1 - 2^-0.5, cnt 2 -> 0.5 (ClassifierSample.java comments)
    act = activation_from_count([1, 2, 4])
    assert abs(act[0] - (1 - 2**-0.5)) < 1e-15
    assert act[1] == 0.5
    assert act[2] == 0.75


def test_predict_hand_computed():
    m = BinaryClassifierModel(3, 2)
    m.w1 = np.array([[1.0, 0.0, -2.0], [0.5, 0.25, 0.0]])
    m.b1 = np.array([0.1, -0.1])
    m.w2 = np.array([2.0, -1.0])
    m.b2 = 0.05
    # features [0, 2]: z1 = [0.1+1-2, -0.1+0.5+0] = [-0.9, 0.4]
    # a = [0, 0.4]; z2 = 0.05 + 0*2 + 0.4*-1 = -0.35
    want = 1.0 / (1.0 + math.exp(0.35))
    assert abs(m.predict([0, 2]) - want) < 1e-15


def test_train_sample_hand_computed():
    m = BinaryClassifierModel(2, 1)
    m.w1 = np.array([[1.0, 0.5]])
    m.b1 = np.array([0.0])
    m.w2 = np.array([1.0])
    m.b2 = 0.0
    lr = 0.1
    # x=[0], y0=1: z1=1, a=1, z2=1, y=sigmoid(1)
    y = 1 / (1 + math.exp(-1))
    m.train_sample(1.0, [0], lr)
    dl_dz2 = y - 1.0
    dldz1 = dl_dz2 * 1.0 * 1.0  # w2=1, relu'(1)=1
    assert abs(m.w1[0, 0] - (1.0 - lr * dldz1)) < 1e-15
    assert m.w1[0, 1] == 0.5  # untouched feature
    assert abs(m.b1[0] - (-lr * dldz1)) < 1e-15
    assert abs(m.w2[0] - (1.0 - lr * dl_dz2 * 1.0)) < 1e-15
    assert abs(m.b2 - (-lr * dl_dz2)) < 1e-15


def test_relu_dead_unit_gets_no_gradient():
    m = BinaryClassifierModel(1, 1)
    m.w1 = np.array([[-1.0]])
    m.w2 = np.array([3.0])
    w1_before = m.w1.copy()
    m.train_sample(1.0, [0], 0.1)
    # z1 = -1 -> relu' = 0 -> hidden weights frozen; output bias moves
    assert np.array_equal(m.w1, w1_before)
    assert m.b2 != 0.0


def test_prune_ambiguous():
    # one hash seen 6x positive and 6x negative -> negatives dropped;
    # an infrequent conflict is kept
    samples = (
        [(1.0, [1, 2], None)] * 6
        + [(0.0, [1, 2], None)] * 6
        + [(1.0, [3], None)] * 2
        + [(0.0, [3], None)] * 2
    )
    kept = prune_ambiguous(samples)
    assert len(kept) == 10
    assert all(not (y < 0.5 and x == [1, 2]) for y, x, _ in kept)


def test_training_separates_synthetic_corpus():
    vocab = build_nsfw_vocabulary([f"tok{i}" for i in range(20)])
    model = train_binary_classifier(
        vocab, synth_training_samples(vocab, n=160), epochs=150
    )
    # positives draw from the upper half of the unigram list
    _, pos_score = model.is_nsfw(vocab, "tok15 tok16 tok17 tok18")
    _, neg_score = model.is_nsfw(vocab, "tok1 tok2 tok3 tok4")
    assert pos_score > 0.5 > neg_score
    # empty features -> not NSFW, score 0
    assert model.is_nsfw(vocab, "zzz qqq") == (False, 0.0)


def test_training_is_deterministic():
    vocab = build_nsfw_vocabulary([f"t{i}" for i in range(12)])
    m1 = train_binary_classifier(vocab, synth_training_samples(vocab, n=80), epochs=40)
    m2 = train_binary_classifier(vocab, synth_training_samples(vocab, n=80), epochs=40)
    assert np.array_equal(m1.w1, m2.w1)
    assert np.array_equal(m1.w2, m2.w2)
    assert m1.b2 == m2.b2


def test_counted_mode_predicts():
    v = ClassifierVocabulary(["a", "b"])
    m = BinaryClassifierModel(2, 1, mode="COUNTED")
    m.w1 = np.array([[1.0, 1.0]])
    m.w2 = np.array([1.0])
    flagged, score = m.is_nsfw(v, "a a b")
    # z1 = act(2)*1 + act(1)*1 = 0.5 + (1-2^-0.5)
    z = 0.5 + (1 - 2**-0.5)
    want = 1 / (1 + math.exp(-z))
    assert abs(score - want) < 1e-15
    assert flagged == (want > 0.5)


def test_nsfw_domain_tier_table():
    # decision table only — membership itself is the md5 rule
    tiers = {nsfw_domain_tier(f"d{i}.com") for i in range(200)}
    assert tiers <= {0, 1, 2}
    assert 0 in tiers  # most domains unblocked


class TestClassifierVocabularyTestVectors:
    """ClassifierVocabularyTest.java — unigram + bigram feature
    collection in insertion order, literal."""

    def test_unigrams(self):
        from marginaliasearch_ray.functions.classifier import (
            ClassifierVocabulary,
        )

        v = ClassifierVocabulary(["foo", "bar"])
        assert v.features("foo") == [0]
        assert v.features("foo foo") == [0]
        assert v.features("bar") == [1]
        assert v.features("foo bar") == [0, 1]
        assert v.features("bar foo") == [1, 0]
        assert v.features("bar baz foo") == [1, 0]

    def test_bigrams(self):
        from marginaliasearch_ray.functions.classifier import (
            ClassifierVocabulary,
        )

        v = ClassifierVocabulary(["foo", "bar", "foo_bar"])
        assert v.features("foo") == [0]
        assert v.features("foo foo") == [0]
        assert v.features("bar") == [1]
        assert v.features("foo bar") == [0, 1, 2]
        assert v.features("bar foo") == [1, 0]
        assert v.features("bar baz foo") == [1, 0]
        assert v.features("foo baz bar") == [0, 1]


class TestBinaryClassifierModelTestVector:
    """BinaryClassifierModelTest.testTrain — the upstream separability
    assertion (1000 epochs at lr 0.1 over the 4-sample NSFW toy set)."""

    def test_train(self):
        from marginaliasearch_ray.functions.classifier import (
            BinaryClassifierModel,
            ClassifierVocabulary,
        )

        v = ClassifierVocabulary(["sex", "pussy", "ass", "academy", "theory", "java"])
        samples = [
            (1.0, v.features("sex ass"), None),
            (1.0, v.features("pussy"), None),
            (0.0, v.features("academy theory"), None),
            (0.0, v.features("java academy"), None),
        ]
        m = BinaryClassifierModel.for_training(6, 16, "BINARY")
        m.train(samples, 1000, 0.1)
        assert m.predict(v.features("pussy sex")) > 0.75
        assert m.predict(v.features("theory java")) < 0.25
