"""DXF group-code kernel (extraction/dxf.py) vs the reference's parser
semantics (reference dxf_text_parser.cc) — hand-built fixtures for the
framing rules, plus the reference's own three REAL drawings
(binder_test_no_refs/18066-G-302/305/307.dxf) pinned to golden
inventories computed once from this kernel and cross-checked against
raw-text marker counts."""

from __future__ import annotations

import os
import re

import pytest

from finetoo_sp_spark.extraction.dxf import (
    dxf_records,
    dxf_version,
    make_dxf,
    parse_dxf_blocks,
    parse_dxf_records,
)

REF_DIR = "/root/reference/binder_test_no_refs"

# golden numbers: computed once from this kernel, block/entity marker
# counts independently confirmed by regex over the raw text (see
# test_real_drawings_marker_cross_check)
GOLDEN = {
    "18066-G-302": {
        "version": "AC1009",
        "entities": 15101,
        "types": {
            "ARC": 11, "ATTRIB": 140, "CIRCLE": 29, "DIMENSION": 114,
            "INSERT": 183, "LINE": 1271, "POLYLINE": 78, "SEQEND": 122,
            "SOLID": 14, "TEXT": 49, "VERTEX": 13090,
        },
        "n_blocks": 365,
        "block_entities": 5489,
        "layers": 19,
    },
    "18066-G-305": {
        "version": "AC1009",
        "entities": 4762,
        "types": {
            "ARC": 25, "ATTRIB": 102, "CIRCLE": 38, "DIMENSION": 29,
            "INSERT": 62, "LINE": 705, "POLYLINE": 44, "SEQEND": 50,
            "SOLID": 11, "TEXT": 30, "VERTEX": 3666,
        },
        "n_blocks": 135,
        "block_entities": 9269,
        "layers": 16,
    },
    "18066-G-307": {
        "version": "AC1009",
        "entities": 11519,
        "types": {
            "ARC": 14, "ATTRIB": 109, "CIRCLE": 31, "DIMENSION": 28,
            "INSERT": 96, "LINE": 1273, "POLYLINE": 134, "SEQEND": 148,
            "SOLID": 24, "TEXT": 17, "VERTEX": 9645,
        },
        "n_blocks": 250,
        "block_entities": 7230,
        "layers": 11,
    },
}

TINY = (
    "  0\r\nSECTION\r\n  2\r\nHEADER\r\n  9\r\n$ACADVER\r\n  1\r\nAC1015\r\n"
    "  0\r\nENDSEC\r\n"
    "  0\r\nSECTION\r\n  2\r\nBLOCKS\r\n"
    "  0\r\nBLOCK\r\n  2\r\nSTAMP\r\n  5\r\nB1\r\n"
    "  0\r\nLINE\r\n  5\r\nE1\r\n  8\r\nL0\r\n 10\r\n0.0\r\n"
    "  0\r\nENDBLK\r\n"
    "  0\r\nBLOCK\r\n  2\r\nSTAMP\r\n  5\r\nB2\r\n"  # duplicate name
    "  0\r\nENDBLK\r\n"
    "  0\r\nENDSEC\r\n"
    "  0\r\nSECTION\r\n  2\r\nENTITIES\r\n"
    "  0\r\nCIRCLE\r\n  5\r\nE2\r\n  8\r\nWALLS\r\n 10\r\n1.0\r\n 40\r\n2.5\r\n"
    "  0\r\nTEXT\r\n  8\r\nNOTES\r\n  1\r\nhello\r\n"
    "  0\r\nENDSEC\r\n  0\r\nEOF\r\n"
)


def test_hand_built_framing_semantics():
    rec = parse_dxf_records(TINY)
    assert dxf_version(TINY) == "AC1015"
    ents = rec[rec.section == "ENTITIES"].reset_index(drop=True)
    assert list(ents.entity_type) == ["CIRCLE", "TEXT"]
    # handle = code 5, layer = code 8, missing handle -> ''
    assert list(ents.handle) == ["E2", ""]
    assert list(ents.layer) == ["WALLS", "NOTES"]
    assert list(ents.n_pairs) == [4, 2]
    blk = rec[rec.section == "BLOCKS"].reset_index(drop=True)
    assert list(blk.entity_type) == ["LINE"]
    assert list(blk.block_name) == ["STAMP"]
    blocks = parse_dxf_blocks(TINY)
    # duplicate block names count as separate blocks (marker semantics)
    assert len(blocks) == 2
    assert list(blocks.block_name) == ["STAMP", "STAMP"]
    assert list(blocks.handle) == ["B1", "B2"]
    assert list(blocks.n_entities) == [1, 0]


def test_malformed_group_code_raises():
    with pytest.raises(ValueError, match="group code"):
        parse_dxf_records("  0\r\nSECTION\r\nnot-a-number\r\nHEADER\r\n")


def test_eof_stops_and_lf_only_accepted():
    rec = parse_dxf_records(
        "0\nSECTION\n2\nENTITIES\n0\nLINE\n5\nH\n0\nENDSEC\n0\nEOF\n"
        "0\nLINE\n5\nGHOST\n"  # after EOF: ignored
    )
    assert list(rec.entity_type) == ["LINE"]
    assert list(rec.handle) == ["H"]


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference corpus absent")
@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_real_drawings_golden_inventory(name):
    raw = open(
        os.path.join(REF_DIR, f"{name}.dxf"), encoding="ascii", errors="replace"
    ).read()
    g = GOLDEN[name]
    assert dxf_version(raw) == g["version"]
    rec = parse_dxf_records(raw)
    ents = rec[rec.section == "ENTITIES"]
    assert len(ents) == g["entities"]
    assert ents.entity_type.value_counts().sort_index().to_dict() == g["types"]
    assert ents.layer.nunique() == g["layers"]
    assert (ents.handle != "").all()
    blocks = parse_dxf_blocks(raw)
    assert len(blocks) == g["n_blocks"]
    assert int(blocks.n_entities.sum()) == g["block_entities"]
    assert len(rec[rec.section == "BLOCKS"]) == g["block_entities"]


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference corpus absent")
@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_real_drawings_marker_cross_check(name):
    """Independent confirmation of the pinned goldens: BLOCK-marker and
    per-type 0-code counts straight off the raw text with a regex —
    no shared code with the kernel."""
    raw = open(
        os.path.join(REF_DIR, f"{name}.dxf"), encoding="ascii", errors="replace"
    ).read()
    g = GOLDEN[name]
    assert len(re.findall(r"(?m)^\s*0\r?\n\s*BLOCK\r?$", raw)) == g["n_blocks"]
    # total 0-code entity markers across BLOCKS+ENTITIES per type
    rec = parse_dxf_records(raw)
    for t, n in g["types"].items():
        raw_count = len(re.findall(rf"(?m)^\s*0\r?\n\s*{t}\r?$", raw))
        kernel_total = int((rec.entity_type == t).sum())
        assert raw_count == kernel_total, (t, raw_count, kernel_total)
        assert kernel_total >= n


def test_spark_dxf_records_roundtrip(spark):
    """make_dxf corpus through the Arrow kernel: closed-form counts."""
    import pandas as pd

    ids = spark.range(0, 60, 1, 4)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["id"].astype("int64"),
                        "payload": [make_dxf(int(i)) for i in pdf["id"]],
                    }
                )

    assets = ids.mapInPandas(gen, "doc_id long, payload binary")
    rec = dxf_records(assets, id_col="doc_id")
    got = {
        (r["doc_id"], r["entity_type"]): r["n"]
        for r in rec.filter("section = 'ENTITIES'")
        .groupBy("doc_id", "entity_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for i in range(60):
        assert got[(i, "LINE")] == 1 + i % 4
        assert got[(i, "TEXT")] == 1 + i % 2
        assert got.get((i, "CIRCLE"), 0) == i % 3
