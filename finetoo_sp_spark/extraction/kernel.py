"""Pure-pandas extraction kernels (no Spark imports).

This module is the per-batch "inner loop" that runs inside Arrow-batched
``mapInPandas`` on executors. It re-expresses the reference's *stateful,
per-row* C++ parser as *vectorized, per-batch* pandas ops:

- reference pair tokenizer (src/parser/dxf_text_parser.cc:124-156, 2-line
  code/value framing)  ->  one regex that partitions the HTML byte stream
  into tag / text tokens, applied via ``Series.str.findall`` (C-level regex,
  no per-row Python);
- reference section state machine (dxf_text_parser.cc:62-122, cumulative
  SECTION/ENDSEC tracking)  ->  per-document cumulative sums over the
  exploded token frame (block ids, anchor depth, raw-text-region depth);
- reference region classification (docs/SEMANTIC_UNDERSTANDING.md:7-60,
  "parts vs annotations via schema flags, not hardcoded per-type rules")
  ->  text-density / link-density block scoring (Boilerpipe/trafilatura
  family of heuristics), computed as column ops over the block frame.

Determinism contract (BASELINE.json: "byte-identical extracted text per
url"): every output column is a pure function of (url, html) — no wall
clock, no partition order, no dict iteration order. The same page yields
the same bytes under any partitioning.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# --- tokenizer ----------------------------------------------------------
# Partitions the document completely: every char belongs to exactly one
# token, so cumulative token lengths give exact char offsets (spans).
_TOKEN_RE = re.compile(r"<[^>]*>|[^<]+", re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_TAG_NAME_RE = re.compile(r"^</?\s*([a-zA-Z][a-zA-Z0-9]*)")

# Tags that open a new logical block/region (reference analogue: a DXF
# BLOCK / SECTION boundary, dxf_text_parser.cc:182-258).
_BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tr td th
    section article header footer nav aside main blockquote pre br hr form
    figure figcaption title body html head fieldset address""".split()
)
# Raw-text containers whose inner text is never content.
_EXCLUDE_TAGS = frozenset("script style noscript template svg".split())
_HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())

# Classification thresholds (documented constants; the synthetic corpus and
# hand-written fixtures are authored against exactly these).
MIN_CONTENT_WORDS = 10  # plain block needs >= 10 words ...
MAX_LINK_DENSITY = 0.33  # ... and < 1/3 of its chars inside <a>
MIN_HEADING_WORDS = 1  # headings count with >= 1 word and no links

_ENTITIES = [  # order matters: &amp; must be decoded last
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_WS_RE = re.compile(r"\s+")

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.S | re.I)
_LANG_RE = re.compile(r'<html[^>]*\blang\s*=\s*["\']?([a-zA-Z-]+)', re.I)
_HREF_RE = re.compile(r'<a\s[^>]*href\s*=\s*["\']?([^"\'>\s]+)', re.I)
_HOST_RE = re.compile(r"^(https?://[^/]+)", re.I)


def _unescape(s: pd.Series) -> pd.Series:
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s


def decode_html(html: pd.Series) -> pd.Series:
    """binary -> str; deterministic utf-8 with replacement."""
    if len(html) and isinstance(html.iloc[0], (bytes, bytearray)):
        try:
            return html.str.decode("utf-8", errors="replace")
        except TypeError:  # older pandas without errors kwarg
            return html.map(lambda b: b.decode("utf-8", "replace"))
    return html.astype("string").astype(object)


def tokenize_batch(html_text: pd.Series) -> pd.DataFrame:
    """Explode documents into one row per token with document-relative
    char offsets and structural annotations.

    Returns columns: ``doc`` (position in batch), ``tok``, ``start``,
    ``end``, ``is_tag``, ``tag``, ``is_close``, ``block_id``,
    ``in_link``, ``in_excluded``, ``block_tag``.
    """
    stripped = html_text.str.replace(_COMMENT_RE, "", regex=True)
    toks = stripped.str.findall(_TOKEN_RE).reset_index(drop=True)
    exploded = toks.explode().dropna()
    tf = pd.DataFrame(
        {"doc": exploded.index.to_numpy(dtype="int64"), "tok": exploded.to_numpy(dtype=object)}
    )
    if tf.empty:
        for c in ("start", "end", "block_id"):
            tf[c] = pd.Series(dtype="int64")
        for c in ("is_tag", "is_close", "in_link", "in_excluded"):
            tf[c] = pd.Series(dtype=bool)
        tf["tag"] = pd.Series(dtype=object)
        tf["block_tag"] = pd.Series(dtype=object)
        return tf

    tok = tf["tok"]
    lens = tok.str.len()
    tf["end"] = lens.groupby(tf["doc"]).cumsum()
    tf["start"] = tf["end"] - lens

    tf["is_tag"] = tok.str.startswith("<")
    tf["tag"] = tok.str.extract(_TAG_NAME_RE, expand=False).str.lower()
    tf["is_close"] = tok.str.startswith("</")

    # anchor depth: +1 at <a>, -1 at </a>; a text token's cumsum-to-here
    # counts all tags before it (its own delta is 0).
    a_delta = np.where(
        (tf["tag"] == "a") & ~tf["is_close"], 1, np.where((tf["tag"] == "a") & tf["is_close"], -1, 0)
    )
    tf["in_link"] = pd.Series(a_delta, index=tf.index).groupby(tf["doc"]).cumsum() > 0

    # raw-text regions (script/style/...): exclude inner text entirely.
    is_excl_tag = tf["tag"].isin(_EXCLUDE_TAGS)
    x_delta = np.where(is_excl_tag & ~tf["is_close"], 1, np.where(is_excl_tag & tf["is_close"], -1, 0))
    tf["in_excluded"] = pd.Series(x_delta, index=tf.index).groupby(tf["doc"]).cumsum() > 0

    # block segmentation: any block-level tag (open or close) starts a new
    # region — the cumsum trick from the reference's section splitter.
    boundary = tf["is_tag"] & tf["tag"].isin(_BLOCK_TAGS)
    tf["block_id"] = boundary.astype("int64").groupby(tf["doc"]).cumsum()

    # block_tag = the tag that opened this region (close-tag boundaries get
    # the closed tag's name; only heading opens matter downstream).
    bt = pd.Series(np.where(boundary & ~tf["is_close"], tf["tag"], None), index=tf.index)
    tf["block_tag"] = bt.groupby(tf["doc"]).ffill()
    return tf


def _norm_text(s: pd.Series) -> pd.Series:
    return _unescape(s).str.replace(_WS_RE, " ", regex=True).str.strip()


def classify_blocks(tf: pd.DataFrame) -> pd.DataFrame:
    """Aggregate the token frame to one row per (doc, block) with density
    features and the content/boilerplate verdict.

    Returns columns: doc, block_id, block_tag, text, n_chars, link_chars,
    n_words, link_density, is_heading, is_content, span_start, span_end.
    """
    txt = tf[~tf["is_tag"] & ~tf["in_excluded"]].copy()
    if txt.empty:
        return pd.DataFrame(
            columns=[
                "doc", "block_id", "block_tag", "text", "n_chars", "link_chars",
                "n_words", "link_density", "is_heading", "is_content",
                "span_start", "span_end",
            ]
        )
    txt["clean"] = _unescape(txt["tok"])
    clean_len = txt["clean"].str.len()
    txt["link_chars"] = np.where(txt["in_link"], clean_len, 0)

    g = txt.groupby(["doc", "block_id"], sort=True)
    blocks = g.agg(
        block_tag=("block_tag", "first"),
        raw=("clean", "sum"),
        link_chars=("link_chars", "sum"),
        span_start=("start", "min"),
        span_end=("end", "max"),
    ).reset_index()

    blocks["text"] = blocks["raw"].str.replace(_WS_RE, " ", regex=True).str.strip()
    blocks = blocks[blocks["text"].str.len() > 0].copy()
    if blocks.empty:
        blocks["n_chars"] = blocks["n_words"] = blocks["link_density"] = 0
        blocks["is_heading"] = blocks["is_content"] = False
        return blocks.drop(columns=["raw"])

    blocks["n_chars"] = blocks["text"].str.len()
    blocks["n_words"] = blocks["text"].str.split().str.len()
    blocks["link_density"] = blocks["link_chars"] / blocks["raw"].str.len().clip(lower=1)
    blocks["is_heading"] = blocks["block_tag"].isin(_HEADING_TAGS)
    non_nav = blocks["link_density"] < MAX_LINK_DENSITY
    blocks["is_content"] = np.where(
        blocks["block_tag"].eq("title"),
        False,  # <title> is a schema field, not body text
        (non_nav & (blocks["n_words"] >= MIN_CONTENT_WORDS))
        | (blocks["is_heading"] & (blocks["link_chars"] == 0) & (blocks["n_words"] >= MIN_HEADING_WORDS)),
    )
    return blocks.drop(columns=["raw"])


def extract_links(urls: pd.Series, html_text: pd.Series) -> pd.DataFrame:
    """Per-page outbound links, relative hrefs resolved against the page
    host (reference analogue: INSERT -> block REFERENCES edges,
    src/graph/graph_builder.cc:41-61). Returns columns (url, target)."""
    urls = urls.reset_index(drop=True)
    html_text = html_text.reset_index(drop=True)
    hrefs = html_text.str.findall(_HREF_RE)
    out = pd.DataFrame({"url": urls, "target": hrefs}).explode("target").dropna(
        subset=["target"]
    )
    if out.empty:
        return pd.DataFrame({"url": pd.Series(dtype=object), "target": pd.Series(dtype=object)})
    host = out["url"].str.extract(_HOST_RE, expand=False).fillna("")
    rel = out["target"].str.startswith("/")
    out["target"] = np.where(rel, host + out["target"], out["target"])
    out = out[out["target"].str.match(r"https?://", na=False)]
    return out.reset_index(drop=True)


def blocks_batch(urls: pd.Series, html: pd.Series) -> pd.DataFrame:
    """Per-batch block-level extraction: one row per non-empty DOM region.

    The relational 'block node' feed for the property graph (reference
    analogue: DXFBlock -> block nodes, graph_builder.cc:137-170).
    """
    urls = urls.reset_index(drop=True)
    html_text = decode_html(html.reset_index(drop=True))
    blocks = classify_blocks(tokenize_batch(html_text))
    if blocks.empty:
        return pd.DataFrame(
            {
                "url": pd.Series(dtype=object),
                "block_id": pd.Series(dtype="int64"),
                "tag": pd.Series(dtype=object),
                "text": pd.Series(dtype=object),
                "n_words": pd.Series(dtype="int64"),
                "n_chars": pd.Series(dtype="int64"),
                "link_density": pd.Series(dtype="float64"),
                "is_content": pd.Series(dtype=bool),
                "span_start": pd.Series(dtype="int64"),
                "span_end": pd.Series(dtype="int64"),
            }
        )
    out = blocks.rename(columns={"block_tag": "tag"}).copy()
    out["url"] = urls.to_numpy(dtype=object)[out["doc"].to_numpy()]
    out["tag"] = out["tag"].where(out["tag"].notna(), "")
    return out[
        [
            "url", "block_id", "tag", "text", "n_words", "n_chars",
            "link_density", "is_content", "span_start", "span_end",
        ]
    ].reset_index(drop=True)


def extract_batch(urls: pd.Series, html: pd.Series) -> pd.DataFrame:
    """Full per-batch extraction: (url, html) -> one row per page.

    Output columns: url, text (main content, blocks joined by '\\n'),
    spans (list of (start, end, tag) dicts — char offsets into the decoded,
    comment-stripped HTML), title, h1, lang_attr, n_blocks,
    n_content_blocks, content_chars.
    """
    urls = urls.reset_index(drop=True)
    html_text = decode_html(html.reset_index(drop=True))

    tf = tokenize_batch(html_text)
    blocks = classify_blocks(tf)

    out = pd.DataFrame({"url": urls})
    out["doc"] = np.arange(len(urls))

    if blocks.empty:
        joined = pd.DataFrame(columns=["doc", "text", "spans", "n_content_blocks", "content_chars"])
    else:
        content = blocks[blocks["is_content"]].copy()
        content["span"] = [
            {"start": int(s), "end": int(e), "tag": (t if isinstance(t, str) else "")}
            for s, e, t in zip(content["span_start"], content["span_end"], content["block_tag"])
        ]
        g = content.groupby("doc", sort=True)
        joined = pd.DataFrame(
            {
                "text": g["text"].agg("\n".join),
                "spans": g["span"].agg(list),
                "n_content_blocks": g.size(),
                "content_chars": g["n_chars"].sum(),
            }
        ).reset_index()

    n_blocks = (
        blocks.groupby("doc", sort=True).size().rename("n_blocks").reset_index()
        if not blocks.empty
        else pd.DataFrame(columns=["doc", "n_blocks"])
    )

    out = out.merge(joined, on="doc", how="left").merge(n_blocks, on="doc", how="left")
    out["text"] = out["text"].fillna("")
    out["spans"] = out["spans"].map(lambda v: v if isinstance(v, list) else [])
    out["n_blocks"] = out["n_blocks"].fillna(0).astype("int64")
    out["n_content_blocks"] = out["n_content_blocks"].fillna(0).astype("int64")
    out["content_chars"] = out["content_chars"].fillna(0).astype("int64")

    # typed schema fields (reference analogue: typed field mapping,
    # proto/graph.proto:213-298 CAD messages; here: title/h1/lang).
    out["title"] = _norm_text(html_text.str.extract(_TITLE_RE, expand=False).fillna(""))
    if not blocks.empty:
        h1 = (
            blocks[blocks["block_tag"].eq("h1")]
            .groupby("doc", sort=True)["text"]
            .first()
            .rename("h1")
            .reset_index()
        )
        out = out.merge(h1, on="doc", how="left")
    if "h1" not in out.columns:
        out["h1"] = ""
    out["h1"] = out["h1"].fillna("")
    out["lang_attr"] = html_text.str.extract(_LANG_RE, expand=False).fillna("")

    return out[
        [
            "url", "text", "spans", "title", "h1", "lang_attr",
            "n_blocks", "n_content_blocks", "content_chars",
        ]
    ]
