"""Unit tests for the pure-pandas extraction kernels.

Mirrors the reference's test strategy (SURVEY.md §5): tokenizer framing,
region segmentation, density classification, determinism — on tiny
hand-computed fixtures, no Spark session needed.
"""

import numpy as np
import pandas as pd
import pytest

from finetoo_sp_spark.extraction.kernel import (
    MIN_CONTENT_WORDS,
    classify_blocks,
    extract_batch,
    tokenize_batch,
)

LONG = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"  # 12 words

FIXTURE_HTML = (
    '<html lang="en"><head><title>My Title</title>'
    "<script>var hidden = 1;</script></head>"
    "<body><nav><ul>"
    '<li><a href="/a">Home</a></li><li><a href="/b">Shop now today</a></li>'
    "</ul></nav>"
    f"<h1>Big Headline</h1><p>{LONG}</p>"
    "<p>too short</p>"
    f'<p>{LONG} &amp; more <a href="/x">ref</a></p>'
    '<footer><a href="/t">terms</a> <a href="/p">privacy</a></footer>'
    "</body></html>"
)
# Hand-computed expectation: h1 + the two long paragraphs (the second long
# paragraph has a short link, link_density well under 1/3), entities decoded.
FIXTURE_EXPECTED = "Big Headline\n" + LONG + "\n" + LONG + " & more ref"


def test_tokenizer_partitions_input():
    html = pd.Series(["<p>hello <b>world</b></p>"])
    tf = tokenize_batch(html)
    # every char accounted for, offsets contiguous
    assert "".join(tf["tok"]) == html[0]
    assert tf["start"].iloc[0] == 0
    assert (tf["end"] - tf["start"] == tf["tok"].str.len()).all()
    assert (tf["start"].iloc[1:].to_numpy() == tf["end"].iloc[:-1].to_numpy()).all()


def test_tokenizer_tags_and_links():
    tf = tokenize_batch(pd.Series(['<p><a href="/x">link</a> plain</p>']))
    link_tok = tf[tf["tok"] == "link"]
    plain_tok = tf[tf["tok"] == " plain"]
    assert bool(link_tok["in_link"].iloc[0])
    assert not bool(plain_tok["in_link"].iloc[0])


def test_script_region_excluded():
    tf = tokenize_batch(pd.Series(["<script>var x=1;</script><p>keep</p>"]))
    assert bool(tf[tf["tok"] == "var x=1;"]["in_excluded"].iloc[0])
    assert not bool(tf[tf["tok"] == "keep"]["in_excluded"].iloc[0])


def test_comment_stripped():
    tf = tokenize_batch(pd.Series(["<p>a<!-- hidden -->b</p>"]))
    assert "".join(tf[~tf["is_tag"]]["tok"]) == "ab"


def test_block_segmentation_cumsum():
    tf = tokenize_batch(pd.Series(["<div>one</div><p>two</p>three"]))
    txt = tf[~tf["is_tag"]]
    assert txt["block_id"].nunique() == 3


def test_classify_density():
    html = pd.Series(
        [f"<p>{LONG}</p>" '<p><a href="/a">all link text here</a></p>' "<p>short</p>"]
    )
    blocks = classify_blocks(tokenize_batch(html))
    by_text = {row.text: row for row in blocks.itertuples()}
    assert by_text[LONG].is_content
    assert not by_text["all link text here"].is_content  # link density 1.0
    assert not by_text["short"].is_content  # < MIN_CONTENT_WORDS


def test_heading_rule():
    blocks = classify_blocks(tokenize_batch(pd.Series(["<h2>Section</h2><h3><a href='/'>nav h</a></h3>"])))
    by_text = {row.text: row for row in blocks.itertuples()}
    assert by_text["Section"].is_content
    assert not by_text["nav h"].is_content  # heading made of links


def test_fixture_extraction_byte_identical():
    out = extract_batch(pd.Series(["u1"]), pd.Series([FIXTURE_HTML.encode()]))
    assert out["text"].iloc[0] == FIXTURE_EXPECTED
    assert out["title"].iloc[0] == "My Title"
    assert out["h1"].iloc[0] == "Big Headline"
    assert out["lang_attr"].iloc[0] == "en"
    assert out["n_content_blocks"].iloc[0] == 3


def test_spans_point_into_decoded_html():
    out = extract_batch(pd.Series(["u1"]), pd.Series([FIXTURE_HTML]))
    spans = out["spans"].iloc[0]
    assert len(spans) == 3
    h1_span = spans[0]
    # the raw slice, whitespace-normalized + entity-decoded, equals the block text
    raw = FIXTURE_HTML[h1_span["start"] : h1_span["end"]]
    assert raw == "Big Headline"
    assert h1_span["tag"] == "h1"


def test_empty_and_degenerate_inputs():
    out = extract_batch(
        pd.Series(["a", "b", "c"]),
        pd.Series([b"", b"no tags at all plain text", b"<p></p>"]),
    )
    assert list(out["url"]) == ["a", "b", "c"]
    assert (out["text"] == "").iloc[0]
    assert (out["text"] == "").iloc[2]


def test_batch_boundary_independence():
    """Same rows, different batch splits -> identical outputs (the
    partition-independence half of byte-identical determinism)."""
    htmls = [FIXTURE_HTML, "<p>" + LONG + "</p>", "<div><a href='/'>x</a></div>"]
    urls = [f"u{i}" for i in range(3)]
    whole = extract_batch(pd.Series(urls), pd.Series(htmls))
    parts = pd.concat(
        [
            extract_batch(pd.Series(urls[:1]), pd.Series(htmls[:1])),
            extract_batch(pd.Series(urls[1:]), pd.Series(htmls[1:])),
        ],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(whole, parts)


def test_datagen_expected_matches_extractor():
    """The independently-computed expected_text equals the extractor output
    for every generated page — the core fixture invariant."""
    from finetoo_sp_spark.datagen import gen_pages_pandas

    pages = gen_pages_pandas(np.arange(200))
    out = extract_batch(pages["url"], pages["html"])
    mismatches = (out["text"] != pages["expected_text"]).sum()
    assert mismatches == 0


def test_datagen_deterministic_and_skewed():
    from finetoo_sp_spark.datagen import gen_pages_pandas

    a = gen_pages_pandas(np.arange(50))
    b = gen_pages_pandas(np.arange(50))
    pd.testing.assert_frame_equal(a, b)
    # split generation must equal whole generation (distributed safety)
    c = pd.concat(
        [gen_pages_pandas(np.arange(0, 20)), gen_pages_pandas(np.arange(20, 50))],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(a, c)
    hosts = gen_pages_pandas(np.arange(2000))["url"].str.extract(r"https://(host\d+)")[0]
    assert hosts.value_counts().iloc[0] > 100  # real skew present
