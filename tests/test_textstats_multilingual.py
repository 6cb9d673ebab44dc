"""Round-5 multilingual segmentation: hand-computed expectations on
tiny literal fixtures — the independent anchor beside the DuckDB twin
(every count below was derived by hand from the codepoint sequence,
never from either engine's output)."""

import pytest

from finetoo_sp_spark.operators import textstats as ts


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# (text, n_chars, n_cjk, n_space_words, n_words_seg, n_tokens_est)
# n_tokens_est = ceil((n_chars - n_cjk)/4) + n_cjk
HAND_TOKEN_CASES = [
    # pure Latin: "hello big world" = 15 chars, 0 cjk, 3 words, ceil(15/4)=4
    ("hello big world", 15, 0, 3, 3, 4),
    # pure Japanese: 日本語のテキスト = 3 han + 1 hira + 4 kata = 8 cjk chars
    ("日本語のテキスト", 8, 8, 0, 8, 8),
    # mixed, no space between scripts: "word漢字word" -> scrubbing the 2
    # han chars to spaces splits the Latin runs: 2 space words + 2 cjk
    ("word漢字word", 10, 2, 2, 4, 2 + 2),  # ceil(8/4)=2 + 2 cjk = 4
    # Korean with an internal space: 안녕 세계 = 4 hangul + space
    ("안녕 세계", 5, 4, 0, 4, 5),  # ceil((5-4)/4)=1 + 4
    # Thai (no spaces): สวัสดีโลก = 9 Thai codepoints (combining marks
    # ั and ี are in the Thai script class)
    ("สวัสดีโลก", 9, 9, 0, 9, 9),
    # empty text
    ("", 0, 0, 0, 0, 0),
    # whitespace only
    ("   ", 3, 0, 0, 0, 1),  # ceil(3/4)=1, words 0
]


def test_token_counts_multilingual_hand_cases(spark):
    rows = [(i, t) for i, (t, *_rest) in enumerate(HAND_TOKEN_CASES)]
    out = {
        r["id"]: r.asDict()
        for r in ts.token_counts_multilingual(_docs(spark, rows), "doc_id", "text").collect()
    }
    for i, (t, n_chars, n_cjk, n_sw, n_seg, n_tok) in enumerate(HAND_TOKEN_CASES):
        got = out[i]
        assert got["n_chars"] == n_chars, (i, t, got)
        assert got["n_cjk"] == n_cjk, (i, t, got)
        assert got["n_space_words"] == n_sw, (i, t, got)
        assert got["n_words_seg"] == n_seg, (i, t, got)
        assert got["n_tokens_est"] == n_tok, (i, t, got)


def test_token_counts_multilingual_agrees_with_plain_on_latin(spark):
    """For pure-Latin text n_words_seg must equal token_counts.n_words
    and n_tokens_est must equal the plain chars/4 proxy."""
    rows = [(1, "the quick brown fox"), (2, "a  b   c"), (3, "one")]
    df = _docs(spark, rows)
    plain = {r["id"]: r.asDict() for r in ts.token_counts(df, "doc_id", "text").collect()}
    multi = {
        r["id"]: r.asDict()
        for r in ts.token_counts_multilingual(df, "doc_id", "text").collect()
    }
    for i in plain:
        assert multi[i]["n_words_seg"] == plain[i]["n_words"]
        assert multi[i]["n_tokens_est"] == plain[i]["n_tokens_est"]


def test_lang_id_script_fallback_chain(spark):
    """Hand-pinned verdicts: kana beats Han (ja), Hangul -> ko, Thai ->
    th, Han alone -> zh, digits -> und; marker words always win over
    scripts when present."""
    rows = [
        (0, "日本語のテキストです"),  # han+kana -> ja, kana count = 7
        (1, "你好世界"),  # han only -> zh, 4
        (2, "안녕하세요"),  # hangul -> ko, 5
        (3, "สวัสดีโลก"),  # thai -> th, 9
        (4, "12345 67890 !!"),  # nothing -> und
        (5, "the cat and the dog in the house"),  # markers -> en
        # marker words present AND han present: marker layer wins
        (6, "the the the 漢字"),
    ]
    out = {
        r["id"]: r.asDict()
        for r in ts.lang_id_script(_docs(spark, rows), "doc_id", "text").collect()
    }
    assert out[0]["pred_lang"] == "ja"
    # kana chars in 日本語のテキストです: の テ キ ス ト で す = 7
    assert out[0]["script_hits"] == 7
    assert out[1]["pred_lang"] == "zh" and out[1]["script_hits"] == 4
    assert out[2]["pred_lang"] == "ko" and out[2]["script_hits"] == 5
    assert out[3]["pred_lang"] == "th" and out[3]["script_hits"] == 9
    assert out[4]["pred_lang"] == "und" and out[4]["script_hits"] == 0
    # en markers: the x3 + and + in = 5
    assert out[5]["pred_lang"] == "en" and out[5]["marker_hits"] == 5
    assert out[5]["script_hits"] == 0
    assert out[6]["pred_lang"] == "en" and out[6]["marker_hits"] == 3
    assert out[6]["script_hits"] == 0


def test_lang_id_script_matches_plain_when_markers_exist(spark):
    rows = [(1, "der und das ist"), (2, "le la les et"), (3, "el que es un")]
    df = _docs(spark, rows)
    plain = {r["id"]: r["pred_lang"] for r in ts.lang_id(df, "doc_id", "text").collect()}
    scripted = {
        r["id"]: r["pred_lang"] for r in ts.lang_id_script(df, "doc_id", "text").collect()
    }
    assert plain == scripted
