"""Freeze the kmeans-TRAINED IVF quantizer as a parquet fixture
(tests/fixtures/ivf_centroids.parquet) so the gated `ann_ivf_topk_trained`
query and its DuckDB oracle read the SAME centroid table (VERDICT r4 #5:
the trained path was pytest-only because data-dependent centroids can't
be inlined as SQL literals — persisting them as a table makes them
oracle-readable input).

Training itself (operators/similarity.py kmeans_centroids) stays pinned
by the independent numpy-parity pytest; this fixture is INPUT to both
engines, not a result snapshot. Regenerate with a reviewed diff only:

    python tools/make_ivf_centroids.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from commoncrawlscalatools_spark import get_spark  # noqa: E402
from commoncrawlscalatools_spark.operators.similarity import kmeans_centroids  # noqa: E402

DEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "ivf_centroids.parquet",
)
TRAIN_SF = "/root/testdata/sf0.01"
K, DIM, SAMPLE, ITERS = 8, 64, 1024, 8


def main():
    spark = get_spark(cores=8, shuffle_partitions=8)
    e = spark.read.parquet(os.path.join(TRAIN_SF, "embeddings.parquet"))
    cents = kmeans_centroids(
        e, "embedding", "vec_id", k=K, dim=DIM, sample=SAMPLE, iters=ITERS
    )
    pdf = pd.DataFrame(
        {"cell_id": list(range(1, K + 1)), "centroid": cents}
    )
    pdf.to_parquet(DEST, index=False)
    print(f"frozen {K}x{DIM} trained centroids at {DEST}")


if __name__ == "__main__":
    main()
