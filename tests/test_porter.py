"""Porter stemmer vectors from the 1980 paper + invariants."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cis555_search_engine_spark.functions.porter import porter_stem

VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl", "triplicate": "triplic",
    "formative": "form", "formalize": "formal", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas", "controll": "control",
    "roll": "roll", "noodle": "noodl", "noodles": "noodl",
    "election": "elect", "elections": "elect", "university": "univers",
    "universities": "univers", "hurricane": "hurrican", "hurricanes": "hurrican",
    "airline": "airlin", "airlines": "airlin", "electricity": "electr",
}


def test_vectors():
    bad = {w: (porter_stem(w), e) for w, e in VECTORS.items() if porter_stem(w) != e}
    assert not bad, bad


def test_short_words_pass_through():
    for w in ("a", "is", "be", "on", ""):
        assert porter_stem(w) == w


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz-", max_size=30))
@settings(max_examples=200, deadline=None)
def test_idempotent_no_crash(w):
    s = porter_stem(w)
    assert isinstance(s, str)
    assert len(s) <= len(w) + 1  # step1b can add an 'e'
