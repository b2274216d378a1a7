"""Tests for the pure-Python METEOR scorer (evaluator/meteor.py):
Porter stemmer parity vs nltk's ORIGINAL_ALGORITHM mode, and METEOR
scoring properties."""

import numpy as np
import pytest

from msr3d_tpu.evaluator.meteor import MeteorScorer, meteor_score, porter_stem


class TestPorterStemmer:
    def test_classic_examples(self):
        for word, want in [
            ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
            ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
            ("agreed", "agre"), ("plastered", "plaster"), ("bled", "bled"),
            ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
            ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"),
            ("tanned", "tan"), ("falling", "fall"), ("hissing", "hiss"),
            ("fizzed", "fizz"), ("failing", "fail"), ("filing", "file"),
            ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
            ("conditional", "condit"), ("rational", "ration"),
            ("valenci", "valenc"), ("hesitanci", "hesit"),
            ("digitizer", "digit"), ("conformabli", "conform"),
            ("radicalli", "radic"), ("differentli", "differ"),
            ("vileli", "vile"), ("analogousli", "analog"),
            ("vietnamization", "vietnam"), ("predication", "predic"),
            ("operator", "oper"), ("feudalism", "feudal"),
            ("decisiveness", "decis"), ("hopefulness", "hope"),
            ("callousness", "callous"), ("formaliti", "formal"),
            ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
            ("triplicate", "triplic"), ("formative", "form"),
            ("formalize", "formal"), ("electriciti", "electr"),
            ("electrical", "electr"), ("hopeful", "hope"),
            ("goodness", "good"), ("revival", "reviv"),
            ("allowance", "allow"), ("inference", "infer"),
            ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
            ("adjustable", "adjust"), ("defensible", "defens"),
            ("irritant", "irrit"), ("replacement", "replac"),
            ("adjustment", "adjust"), ("dependent", "depend"),
            ("adoption", "adopt"), ("homologou", "homolog"),
            ("communism", "commun"), ("activate", "activ"),
            ("angulariti", "angular"), ("homologous", "homolog"),
            ("effective", "effect"), ("bowdlerize", "bowdler"),
            ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
            ("controll", "control"), ("roll", "roll"),
        ]:
            assert porter_stem(word) == want, word

    def test_parity_with_nltk_original_mode(self):
        from nltk.stem.porter import PorterStemmer

        ps = PorterStemmer(mode="ORIGINAL_ALGORITHM")
        # length-≤2 words excluded: we follow Porter's official C version
        # (words of length ≤2 left unchanged); nltk ORIGINAL stems "is"→"i"
        vocab = (
            "the chair near window standing on tables quickly running "
            "jumped happily organization national relational agreeable "
            "dogs cats boxes churches knives leaves wolves babies cities "
            "generalization itemization sensational traditional references "
            "apple apples walking walked walks talked talking bigger biggest "
            "counting counted counts navigate navigation navigator situated "
            "description describing described answers answering colors colored"
        ).split()
        mismatches = [
            (w, porter_stem(w), ps.stem(w)) for w in vocab if porter_stem(w) != ps.stem(w)
        ]
        assert not mismatches, mismatches


class TestMeteorScore:
    def test_identical_is_near_one(self):
        s = meteor_score("there are two chairs", ["there are two chairs"])
        # one chunk: penalty = gamma*(1/4)^beta; f_mean = 1
        assert 0.5 < s <= 1.0
        assert s == pytest.approx(1.0 - 0.6 * (1 / 4) ** 0.2)

    def test_disjoint_is_zero(self):
        assert meteor_score("red cube", ["blue sphere nothing"]) == 0.0

    def test_stem_match_gets_partial_credit(self):
        full = meteor_score("the cat sits", ["the cat sits"])
        stemmed = meteor_score("the cat sitting", ["the cat sits"])
        assert 0 < stemmed < full

    def test_word_order_penalized(self):
        in_order = meteor_score("a b c d e f", ["a b c d e f"])
        shuffled = meteor_score("f e d c b a", ["a b c d e f"])
        assert shuffled < in_order

    def test_multi_reference_takes_best(self):
        refs = ["completely different words", "two chairs by the table"]
        s_multi = meteor_score("two chairs by the table", refs)
        s_single = meteor_score("two chairs by the table", [refs[1]])
        assert s_multi == s_single

    def test_scorer_contract(self):
        gts = {0: ["a red chair"], 1: ["two tables"]}
        res = {0: ["a red chair"], 1: ["something else"]}
        mean, per = MeteorScorer().compute_score(gts, res)
        assert len(per) == 2 and per[0] > per[1]
        assert mean == pytest.approx(np.mean(per))

    def test_empty_hypothesis(self):
        assert meteor_score("", ["a b"]) == 0.0
        mean, per = MeteorScorer().compute_score({0: ["x"]}, {0: [""]})
        assert mean == 0.0
