"""spark-submit probe: time each pipeline stage separately at one master."""

from __future__ import annotations

import json
import shutil
import sys
import time


def main() -> None:
    corpus = sys.argv[1]
    from finetoo_sp_spark.extraction.extract import extract_pages, url_salt
    from finetoo_sp_spark.session import get_spark

    spark = get_spark(app_name="probe", master=None)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(corpus)
    extract_pages(pages.limit(10000)).select("url").count()  # warm

    out = {}
    t = time.time()
    extract_pages(pages).select("url").count()
    out["a_extract_only"] = round(time.time() - t, 2)

    pages_b = pages.withColumn("bucket", url_salt(256))
    t = time.time()
    extract_pages(pages_b.repartition(256, "bucket"), keep_cols=["bucket"]).select(
        "url"
    ).count()
    out["b_shuffle_then_extract"] = round(time.time() - t, 2)

    ext = extract_pages(pages_b.repartition(256, "bucket"), keep_cols=["bucket"])
    shutil.rmtree("/tmp/probe_out", ignore_errors=True)
    t = time.time()
    ext.write.mode("overwrite").partitionBy("bucket").parquet("/tmp/probe_out")
    out["c_full_write"] = round(time.time() - t, 2)

    ext2 = extract_pages(pages_b, keep_cols=["bucket"])
    shutil.rmtree("/tmp/probe_out2", ignore_errors=True)
    t = time.time()
    ext2.repartition(256, "bucket").write.mode("overwrite").partitionBy("bucket").parquet(
        "/tmp/probe_out2"
    )
    out["d_extract_shuffle_after_write"] = round(time.time() - t, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
