"""Confusion-gate tests for the char-n-gram language identifier
(VERDICT r3 #8: replace the 4-language toy stopword voter with real
char-n-gram profiles, graded with a confusion gate).

The fixtured corpus is deliberately hostile: single sentences,
accents stripped (so es/it/pt lose their best discriminators), none
of them drawn from the UDHR seed texts the profiles are built from.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

# lang -> six held-out single sentences (accent-stripped on purpose)
SENTENCES = {
    "en": ["The quick brown fox jumps over the lazy dog near the river bank.",
           "She was reading a book about the history of science last night.",
           "We should meet tomorrow morning to discuss the new project plans.",
           "The weather has been quite cold this winter in the northern states.",
           "He wrote a letter to his brother who lives across the ocean.",
           "Many people enjoy walking through the park on sunny afternoons."],
    "es": ["El rapido zorro marron salta sobre el perro perezoso junto al rio.",
           "Ella estaba leyendo un libro sobre la historia de la ciencia.",
           "Debemos reunirnos manana por la manana para hablar del proyecto.",
           "El tiempo ha sido muy frio este invierno en el norte del pais.",
           "Escribio una carta a su hermano que vive al otro lado del mar.",
           "A mucha gente le gusta caminar por el parque las tardes soleadas."],
    "fr": ["Le rapide renard brun saute par-dessus le chien paresseux pres de la riviere.",
           "Elle lisait un livre sur l'histoire des sciences hier soir.",
           "Nous devrions nous retrouver demain matin pour discuter du projet.",
           "Le temps a ete tres froid cet hiver dans le nord du pays.",
           "Il a ecrit une lettre a son frere qui habite de l'autre cote de la mer.",
           "Beaucoup de gens aiment se promener dans le parc les apres-midis."],
    "de": ["Der schnelle braune Fuchs springt uber den faulen Hund am Fluss.",
           "Sie las gestern Abend ein Buch uber die Geschichte der Wissenschaft.",
           "Wir sollten uns morgen fruh treffen, um das neue Projekt zu besprechen.",
           "Das Wetter war in diesem Winter im Norden des Landes sehr kalt.",
           "Er schrieb einen Brief an seinen Bruder, der jenseits des Meeres wohnt.",
           "Viele Menschen gehen gern an sonnigen Nachmittagen im Park spazieren."],
    "it": ["La rapida volpe marrone salta sopra il cane pigro vicino al fiume.",
           "Stava leggendo un libro sulla storia della scienza ieri sera.",
           "Dovremmo incontrarci domani mattina per discutere del nuovo progetto.",
           "Il tempo e stato molto freddo questo inverno nel nord del paese.",
           "Ha scritto una lettera a suo fratello che vive oltre il mare.",
           "A molte persone piace passeggiare nel parco nei pomeriggi di sole."],
    "pt": ["A rapida raposa marrom pula sobre o cao preguicoso perto do rio.",
           "Ela estava lendo um livro sobre a historia da ciencia ontem a noite.",
           "Devemos nos encontrar amanha de manha para discutir o novo projeto.",
           "O tempo tem sido muito frio neste inverno no norte do pais.",
           "Ele escreveu uma carta ao seu irmao que mora do outro lado do mar.",
           "Muitas pessoas gostam de caminhar pelo parque nas tardes de sol."],
}

ROMANCE = {"es", "it", "pt", "fr"}

JUNK = ["12345 67890 000 111", "", "zz", "   ",
        "你好世界 这是一个测试 语言识别",
        "<<<>>> {}{}[] ### @@@ %%%"]


def _detect_all(spark, detector):
    rows = [(lang, s) for lang, ss in SENTENCES.items() for s in ss]
    rows += [(lang + "_para", " ".join(ss))
             for lang, ss in SENTENCES.items()]
    rows += [("und", j) for j in JUNK]
    df = spark.createDataFrame(rows, "expected string, text string")
    return df.select("expected",
                     detector(F.col("text")).alias("got")).collect()


def _gate(rows):
    per_lang_ok = {lang: 0 for lang in SENTENCES}
    misses = []
    for r in rows:
        exp = r["expected"]
        if exp.endswith("_para"):
            assert r["got"] == exp[:-5], \
                f"paragraph-level must be perfect: {exp} -> {r['got']}"
        elif exp == "und":
            assert r["got"] == "und", f"junk must map to und: {r['got']}"
        elif r["got"] == exp:
            per_lang_ok[exp] += 1
        else:
            misses.append((exp, r["got"]))
    # non-Romance and fr: perfect; hard accent-stripped Romance: >=4/6
    for lang in ("en", "de", "fr"):
        assert per_lang_ok[lang] == 6, (lang, per_lang_ok, misses)
    for lang in ("es", "it", "pt"):
        assert per_lang_ok[lang] >= 4, (lang, per_lang_ok, misses)
    # overall accuracy and confusion confinement
    assert sum(per_lang_ok.values()) >= 31, (per_lang_ok, misses)
    for exp, got in misses:
        assert exp in ROMANCE - {"fr"} and got in ROMANCE, \
            f"confusions must stay within the Romance family: {misses}"


def test_ngram_lid_confusion_gate_native(spark):
    from trial_data_ingestion_spark.operators.textstats import (
        detect_language_ngram,
    )
    _gate(_detect_all(spark, detect_language_ngram))


def test_ngram_lid_confusion_gate_arrow(spark):
    from trial_data_ingestion_spark.operators.textstats import (
        detect_language_ngram_arrow,
    )
    _gate(_detect_all(spark, detect_language_ngram_arrow))


def test_ngram_lid_arrow_matches_native(spark):
    """The Arrow scale twin and the native Column reference must
    agree row for row over sentences, paragraphs, and junk."""
    from trial_data_ingestion_spark.operators.textstats import (
        detect_language_ngram, detect_language_ngram_arrow,
    )
    rows = ([(s,) for ss in SENTENCES.values() for s in ss]
            + [(" ".join(ss),) for ss in SENTENCES.values()]
            + [(j,) for j in JUNK]
            + [(None,)])
    df = spark.createDataFrame(rows, "text string")
    got = df.select(
        detect_language_ngram(F.col("text")).alias("native"),
        detect_language_ngram_arrow(F.col("text")).alias("arrow"),
    ).collect()
    for r in got:
        assert r["native"] == r["arrow"], (r["native"], r["arrow"])


def test_ngram_lid_profiles_are_sane():
    """Profile invariants: every language has both orders, weights
    are negative log-probs, packed rows carry one slot per language,
    and the packed tables stay small enough for plan-literal use."""
    from trial_data_ingestion_spark.operators import lid_profiles as lp
    assert set(lp.PROFILES) == set(lp.NGRAM_ORDERS)
    for n in lp.NGRAM_ORDERS:
        assert set(lp.PROFILES[n]) == set(lp.LANGS)
        for g, ws in lp.PACKED[n].items():
            assert len(g) == n
            assert len(ws) == len(lp.LANGS)
            assert all(w < 0 for w in ws)
        assert len(lp.PACKED[n]) < 1000
