"""Measure IVF / PQ recall vs the exact int-metric baseline, fixture
codebook vs Lloyd-trained codebook (verdict r3 item 5 'done' evidence).

Run: python tools/ann_recall.py [sf_dir]
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main():
    from pyspark.sql import SparkSession, functions as F

    from privacy_crawler_parser_tokenizer_spark.operators.kmeans import (
        lloyd_int,
        lloyd_int_grouped,
        quantize_milli,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", quantize_milli(F.col("embedding")).alias("q")
    )
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    Q = np.array([r["q"] for r in rows], dtype=np.int64)  # 500 x 64
    ids = np.array([r["vec_id"] for r in rows])
    assert (ids == np.arange(len(ids))).all()

    def sqd(a, b):  # int64 exact
        d = a[:, None, :] - b[None, :, :]
        return (d * d).sum(-1)

    # ---- IVF: queries 8..17, top-3 in own cell vs exact top-3 ----
    init8 = [Q[i].tolist() for i in range(8)]
    trained8 = lloyd_int(emb, k=8, dim=64, iters=2, init=init8)

    def ivf_recall(cents):
        C = np.array(cents, dtype=np.int64)
        assign = sqd(Q, C).argmin(1)  # ties: argmin picks lowest idx
        rec = []
        for qid in range(8, 18):
            d = sqd(Q[qid : qid + 1], Q)[0]
            order = np.lexsort((np.arange(len(Q)), d))
            exact = [i for i in order if i != qid][:3]
            cell = [i for i in order if i != qid and assign[i] == assign[qid]][:3]
            rec.append(len(set(exact) & set(cell)) / 3)
        return float(np.mean(rec))

    r_fix, r_tr = ivf_recall(init8), ivf_recall(trained8)
    print(f"IVF recall@3  fixture={r_fix:.3f}  trained={r_tr:.3f}")

    # ---- PQ: queries 16..25, ADC top-5 vs exact top-5 ----
    M, SD, K = 4, 16, 16
    sub_df = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("q", m * SD + 1, SD).alias("sv"),
                    )
                    for m in range(M)
                ]
            )
        ).alias("_e"),
    ).select("vec_id", F.col("_e.m").alias("m"), F.col("_e.sv").alias("sv"))
    init_pq = {m: [Q[i].reshape(M, SD)[m].tolist() for i in range(K)] for m in range(M)}
    trained_pq = lloyd_int_grouped(sub_df, k=K, dim=SD, iters=2, init=init_pq)

    def pq_recall(cb):
        CW = np.array([[cb[m][c] for c in range(K)] for m in range(M)], dtype=np.int64)
        S = Q.reshape(len(Q), M, SD)
        # codes for db vectors (vec_id >= 16)
        codes = np.stack(
            [sqd(S[:, m, :], CW[m]).argmin(1) for m in range(M)], axis=1
        )  # N x M
        rec = []
        for qid in range(16, 26):
            # ADC: sum over m of d(query_sub, codeword of neighbor)
            tabs = np.stack([sqd(S[qid : qid + 1, m, :], CW[m])[0] for m in range(M)])
            dist = np.array(
                [
                    tabs[np.arange(M), codes[n]].sum() if n >= 16 and n != qid else 2**62
                    for n in range(len(Q))
                ]
            )
            order = np.lexsort((np.arange(len(Q)), dist))
            approx = list(order[:5])
            d = sqd(Q[qid : qid + 1], Q)[0]
            ex_order = np.lexsort((np.arange(len(Q)), d))
            exact = [i for i in ex_order if i != qid and i >= 16][:5]
            rec.append(len(set(exact) & set(approx)) / 5)
        return float(np.mean(rec))

    p_fix, p_tr = pq_recall(init_pq), pq_recall(trained_pq)
    print(f"PQ  recall@5  fixture={p_fix:.3f}  trained={p_tr:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
