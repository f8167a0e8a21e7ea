"""Bag-of-binary-words place recognition (the DBoW2 role — reference:
ORB-SLAM3/Thirdparty/DBoW2 + KeyFrameDatabase.cc DetectLoopCandidates).

Checks: binary k-means vocabulary quality, TF-IDF retrieval precision with
distractor places, pre-training fallback behavior, and raw-descriptor
(relocalization-style) queries.
"""
import numpy as np

from photo_slam_tpu.tracking.vocab import BinaryVocab, KeyframeDatabase


def _places(rng, n_places=4, protos_per_place=40):
    return [rng.randint(0, 256, (protos_per_place, 32), dtype=np.uint8)
            for _ in range(n_places)]


def _sample_kf(rng, protos, n=200, flip=0.02):
    base = protos[rng.randint(0, len(protos), n)]
    noise = rng.rand(n, 32, 8) < flip
    bits = np.unpackbits(base, axis=1).reshape(n, 32, 8) ^ noise
    return np.packbits(bits.reshape(n, -1), axis=1)


class TestBinaryVocab:
    def test_kmeans_recovers_clusters(self):
        rng = np.random.RandomState(0)
        protos = rng.randint(0, 256, (8, 32), dtype=np.uint8)
        desc = _sample_kf(rng, protos, n=2000, flip=0.01)
        vocab = BinaryVocab.train(desc, k=8, seed=1)
        # Descriptors from the same prototype map to the same word.
        a = vocab.assign(_sample_kf(rng, protos[:1], n=50, flip=0.01))
        assert len(np.unique(a)) <= 2  # one dominant word (maybe a split)
        counts = np.bincount(a)
        assert counts.max() >= 40

    def test_assign_matches_hamming_argmin(self):
        rng = np.random.RandomState(1)
        desc = rng.randint(0, 256, (300, 32), dtype=np.uint8)
        vocab = BinaryVocab.train(desc, k=16, seed=0)
        q = rng.randint(0, 256, (64, 32), dtype=np.uint8)
        got = vocab.assign(q)
        # Brute-force popcount reference.
        pop = np.array([bin(i).count("1") for i in range(256)])
        d = pop[np.bitwise_xor(q[:, None, :], vocab.words[None])].sum(2)
        np.testing.assert_array_equal(got, d.argmin(1))


class TestKeyframeDatabase:
    def _build(self, rng, kfs_per_place=4, n_places=4):
        protos = _places(rng, n_places)
        db = KeyframeDatabase(train_min_kfs=4, train_min_desc=800, seed=0)
        place_of = {}
        kfid = 0
        for rep in range(kfs_per_place):
            for p in range(n_places):
                db.add(kfid, _sample_kf(rng, protos[p]))
                place_of[kfid] = p
                kfid += 1
        return db, place_of, protos

    def test_retrieval_precision(self):
        rng = np.random.RandomState(2)
        db, place_of, _ = self._build(rng)
        assert db.trained
        # Every query's top-2 hits are same-place (precision@2 == 1).
        for q in place_of:
            hits = db.query(q, topk=2)
            assert all(place_of[k] == place_of[q] for k, _ in hits), (
                q, hits)

    def test_scores_separate_places(self):
        rng = np.random.RandomState(3)
        db, place_of, _ = self._build(rng)
        same = [db.score(a, b) for a in place_of for b in place_of
                if a < b and place_of[a] == place_of[b]]
        diff = [db.score(a, b) for a in place_of for b in place_of
                if a < b and place_of[a] != place_of[b]]
        assert min(same) > max(diff) + 0.1, (min(same), max(diff))

    def test_raw_descriptor_query(self):
        rng = np.random.RandomState(4)
        db, place_of, protos = self._build(rng)
        hits = db.query(_sample_kf(rng, protos[2]), topk=3)
        assert all(place_of[k] == 2 for k, _ in hits), hits

    def test_untrained_returns_nothing(self):
        rng = np.random.RandomState(5)
        db = KeyframeDatabase(train_min_kfs=100, train_min_desc=10**9)
        db.add(0, rng.randint(0, 256, (200, 32), dtype=np.uint8))
        assert not db.trained
        assert db.query(0) == []
        assert db.score(0, 0) == 0.0
        assert 0 in db  # pending keyframes are still indexed for later

    def test_exclusion(self):
        rng = np.random.RandomState(6)
        db, place_of, _ = self._build(rng)
        hits = db.query(0, exclude={k for k, p in place_of.items()
                                    if p == 0})
        assert all(place_of[k] != 0 for k, _ in hits)
