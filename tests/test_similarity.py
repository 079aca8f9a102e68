"""Pin each feature function to the reference formulas
(style of reference tests/test_features.py + tests/test_utils.py)."""

import math

import pytest

from alligator_spark.functions import similarity as sim


class TestNgrams:
    def test_identical_strings_score_one(self):
        # reference alligator/utils.py:135-140 — identical -> 1.0
        assert sim.ngram_overlap("fight club", "fight club", 3) == 1.0
        assert sim.ngram_overlap("fight club", "fight club", None) == 1.0

    def test_formula_intersection_over_max(self):
        # A = {abc, bcd}, B = {abc} -> 1 / max(2,1,1)
        assert sim.ngram_overlap("abcd", "abc", 3) == pytest.approx(1 / 2)

    def test_token_shorter_than_n_contributes_nothing(self):
        # reference word2ngrams: range(len-n+1) empty for short tokens
        assert sim.get_ngrams("ab cd", 3) == set()

    def test_ngram_none_means_whole_tokens(self):
        assert sim.get_ngrams("brad pitt", None) == {"brad", "pitt"}

    def test_disjoint_is_zero(self):
        assert sim.ngram_overlap("aaaa", "bbbb", 3) == 0.0


class TestTokenOverlap:
    def test_formula(self):
        # {a,b,c} vs {a,b} -> 2/3
        assert sim.token_overlap("a b c", "a b") == pytest.approx(2 / 3)

    def test_empty_strings(self):
        # set("".split(" ")) == {""} -> overlap 1.0 (reference behavior)
        assert sim.token_overlap("", "") == 1.0


class TestLevenshtein:
    @pytest.mark.parametrize(
        "a,b,d",
        [
            ("kitten", "sitting", 3),
            ("", "abc", 3),
            ("abc", "", 3),
            ("abc", "abc", 0),
            ("flaw", "lawn", 2),
            ("intention", "execution", 5),
        ],
    )
    def test_distance(self, a, b, d):
        assert sim.levenshtein(a, b) == d

    def test_normalized(self):
        # reference alligator/utils.py:153-158: dist / max(len, len, 1)
        assert sim.levenshtein_norm("kitten", "sitting") == pytest.approx(3 / 7)
        assert sim.levenshtein_norm("", "") == 0.0


class TestNumberSimilarity:
    def test_formula(self):
        # reference alligator/utils.py:161-174: 1 - |a-b|/max(|a|,|b|,1)
        assert sim.number_similarity("100", "90") == pytest.approx(1 - 10 / 100)

    def test_identical(self):
        assert sim.number_similarity("3.5", "3.5") == 1.0

    def test_parse_failure_is_zero(self):
        assert sim.number_similarity("abc", "3") == 0.0

    def test_small_values_denominator_floor_one(self):
        assert sim.number_similarity("0.5", "0.1") == pytest.approx(1 - 0.4)


class TestDates:
    def test_year_only_parses_as_jan_first(self):
        # reference alligator/utils.py:78-111: int -> f"{Y}-01-01"
        d = sim.parse_date("1999")
        assert (d.year, d.month, d.day) == (1999, 1, 1)

    def test_strip_first_char_fallback(self):
        d = sim.parse_date("~1999-05-03")
        assert (d.year, d.month, d.day) == (1999, 5, 3)

    def test_date_similarity_mean_of_ymd(self):
        # reference alligator/utils.py:177-190
        s = sim.date_similarity("2000-06-15", "2000-06-15")
        assert s == 1.0
        s2 = sim.date_similarity("2000", "2010")
        expected = (1 - 10 / 2010 + 1.0 + 1.0) / 3
        assert s2 == pytest.approx(expected)

    def test_unparseable_is_zero(self):
        assert sim.date_similarity("nonsense!!", "2000") == 0.0


class TestJaroWinkler:
    def test_known_value(self):
        assert sim.jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-3)

    def test_identity_and_disjoint(self):
        assert sim.jaro_winkler("abc", "abc") == 1.0
        assert sim.jaro_winkler("abc", "xyz") == 0.0


class TestHashing:
    def test_minhash_determinism(self):
        from alligator_spark.functions.hashing import minhash_band_keys

        a = minhash_band_keys(["hello world"], 16, 8, 7)
        b = minhash_band_keys(["hello world"], 16, 8, 7)
        assert a == b
        assert len(a[0]) == 8

    def test_minhash_similar_strings_share_band(self):
        from alligator_spark.functions.hashing import minhash_band_keys

        keys = minhash_band_keys(["jonathan smithson", "jonathan smithsen"], 16, 8, 7)
        assert set(keys[0]) & set(keys[1])

    def test_simhash_close_for_similar(self):
        from alligator_spark.functions.hashing import hamming64, simhash64

        h1 = simhash64("the quick brown fox jumps over the lazy dog")
        h2 = simhash64("the quick brown fox jumps over the lazy dogs")
        h3 = simhash64("completely different content here")
        assert hamming64(h1, h2) < hamming64(h1, h3)

    def test_simhash_deterministic(self):
        from alligator_spark.functions.hashing import simhash64

        assert simhash64("abc def") == simhash64("abc def")


def test_logistic_score_margins():
    """The deterministic scorer must separate the reference match
    thresholds by construction: a true-duplicate-shaped feature point
    scores >= 0.92 (strong) and a near-miss-distractor-shaped point
    scores < 0.75 (below min) — SURVEY §7.3 margin requirement."""
    from alligator_spark.operators.scoring import (
        SCORE_CENTER,
        SCORE_SLOPE,
        SCORE_WEIGHTS,
    )

    def score(f):
        s = sum(w * f.get(k, 0.0) for k, w in SCORE_WEIGHTS.items())
        return 1 / (1 + math.exp(-SCORE_SLOPE * (s - SCORE_CENTER)))

    # feature point of the hardest observed true duplicate on the gold
    # fixtures (token-drop + reorder mention noise, intact literal context)
    worst_true = {
        "ed_score": 0.45,
        "jaccard_score": 0.67,
        "jaccardNgram_score": 0.65,
        "jw_score": 0.6,
        "lit_str_sim": 1.0,
        "lit_num_close": 0.85,
        "lit_date_close": 0.83,
        "p_subj_lit_row": 0.6,
    }
    best_false = {
        "ed_score": 0.9,
        "jaccard_score": 0.5,
        "jaccardNgram_score": 0.8,
        "jw_score": 0.95,
        "lit_str_sim": 0.2,
        "lit_num_close": 0.0,
        "lit_date_close": 0.0,
        "p_subj_lit_row": 0.3,
    }
    assert score(worst_true) >= 0.92
    assert score(best_false) < 0.75


class TestBatchKernelEquivalence:
    """The r6 vectorized batch kernels must be bit-identical to the
    scalar reference kernels they replaced (hashing.py keeps the scalar
    paths as the executable specification)."""

    TEXTS = [
        "hello world",
        "",
        "ab",
        "abc",
        "the quick brown fox jumps over the lazy dog",
        "x" * 500,
        "café au lait ünïcödé",
        "a b c d e f g",
        "39ad0f3c" * 4,
        " leading and trailing ",
        "日本語テキスト",
        "mixed ascii and ünicode tail",
    ]

    def test_batch_shingles_match_scalar(self):
        import numpy as np

        from alligator_spark.functions.hashing import _batch_shingles, shingle_hashes

        hs, starts, counts = _batch_shingles(self.TEXTS)
        for i, t in enumerate(self.TEXTS):
            ref = shingle_hashes(t, 3)
            got = hs[starts[i] : starts[i] + counts[i]]
            assert np.array_equal(ref, got), t

    def test_batch_minhash_sigs_match_scalar(self):
        import numpy as np

        from alligator_spark.functions.hashing import (
            _rng_params,
            minhash_signature,
            minhash_sigs_batch,
        )

        a, b = _rng_params(16, 7)
        sigs = minhash_sigs_batch(self.TEXTS, 16, 7)
        for i, t in enumerate(self.TEXTS):
            assert np.array_equal(minhash_signature(t or "", 16, a, b), sigs[i]), t

    def test_batch_band_keys_match_scalar_loop(self):
        import zlib

        from alligator_spark.functions.hashing import (
            _rng_params,
            minhash_band_keys,
            minhash_signature,
        )

        for nh, nb, seed in [(16, 4, 7), (32, 8, 17)]:
            a, b = _rng_params(nh, seed)
            rows = nh // nb
            expected = []
            for t in self.TEXTS:
                sig = minhash_signature(t or "", nh, a, b)
                keys = []
                for bi in range(nb):
                    chunk = sig[bi * rows : (bi + 1) * rows]
                    keys.append(f"mh{bi}:{zlib.crc32(chunk.tobytes()) & 0xFFFFFFFF:08x}")
                expected.append(keys)
            assert minhash_band_keys(self.TEXTS, nh, nb, seed) == expected

    def test_batch_simhash_matches_scalar(self):
        from alligator_spark.functions.hashing import simhash64, simhash64_batch

        def to_i64(v: int) -> int:
            return v - (1 << 64) if v >= (1 << 63) else v

        batch = simhash64_batch(self.TEXTS)
        for i, t in enumerate(self.TEXTS):
            assert to_i64(simhash64(t or "")) == int(batch[i]), t

    def test_crc32_mat_matches_zlib(self):
        import zlib

        import numpy as np

        from alligator_spark.functions.hashing import _crc32_mat

        rng = np.random.RandomState(0)
        mat = rng.randint(0, 256, size=(200, 3)).astype(np.uint8)
        got = _crc32_mat(mat)
        for i in range(mat.shape[0]):
            assert int(got[i]) == zlib.crc32(mat[i].tobytes())
