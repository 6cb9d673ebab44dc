"""spark-submit drive script: end-to-end extraction with lineage + resume.

Run (the north-rule launch path):
    cd /root/repo && zip -qr /tmp/finetoo_sp_spark.zip finetoo_sp_spark
    spark-submit --master 'local[8]' --py-files /tmp/finetoo_sp_spark.zip \
        tools/drive_extract.py [n_pages] [out_dir]

Steps: generate corpus -> write/read parquet -> resumable extraction with
per-bucket manifests -> byte-identical check vs expected_text -> delete a
few manifests -> re-run, observing only the missing buckets recompute.
Prints a final JSON line with throughput + verification results.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/finetoo_drive_out"
    corpus_dir = os.path.join(out_dir, "corpus")
    extract_dir = os.path.join(out_dir, "extracted")
    shutil.rmtree(out_dir, ignore_errors=True)

    from finetoo_sp_spark.datagen import write_pages
    from finetoo_sp_spark.session import get_spark
    from finetoo_sp_spark.sources.lineage import run_resumable_extraction

    spark = get_spark(app_name="finetoo_drive", master=None)  # master from spark-submit
    spark.sparkContext.setLogLevel("ERROR")

    # fixed 128-way layout: identical input files for every cluster size,
    # and enough splits that local[32] (or 4N executors) never starves.
    write_pages(spark, n_pages, corpus_dir, partitions=128)
    pages = spark.read.parquet(corpus_dir)

    t0 = time.time()
    metrics = run_resumable_extraction(pages, extract_dir)
    elapsed = time.time() - t0
    pps = metrics["rows_out"] / elapsed if elapsed else 0.0

    # byte-identical verification vs the generator's independent expectation
    extracted = spark.read.parquet(os.path.join(extract_dir, "data"))
    joined = extracted.select("url", "text").join(
        pages.select("url", "expected_text"), "url"
    )
    n_total = joined.count()
    n_bad = joined.filter(F.col("text") != F.col("expected_text")).count()

    # resume: delete 3 bucket manifests, re-run, expect exactly 3 recomputed
    victims = sorted(glob.glob(os.path.join(extract_dir, "_manifests", "bucket=*")))[:3]
    for v in victims:
        shutil.rmtree(v)
    m2 = run_resumable_extraction(pages, extract_dir)

    n_bad2 = (
        spark.read.parquet(os.path.join(extract_dir, "data"))
        .select("url", "text")
        .join(pages.select("url", "expected_text"), "url")
        .filter(F.col("text") != F.col("expected_text"))
        .count()
    )

    print(
        json.dumps(
            {
                "n_pages": n_pages,
                "rows_out": metrics["rows_out"],
                "extract_sec": round(elapsed, 2),
                "pages_per_sec": round(pps, 1),
                "mismatched_text_rows": n_bad,
                "joined_rows": n_total,
                "phases": metrics.get("phases"),
                "resume_buckets_processed": m2["buckets_processed"],
                "resume_expected_buckets": len(victims),
                "mismatches_after_resume": n_bad2,
                "ok": n_bad == 0
                and n_bad2 == 0
                and n_total == n_pages
                and m2["buckets_processed"] == len(victims),
            }
        )
    )


if __name__ == "__main__":
    main()
