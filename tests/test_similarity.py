"""IVF ANN quality: k-means-trained centroids must beat the seed set.

The point of training (VERDICT r1 #5): Lloyd's iterations move the
coarse quantizer toward the data's actual cluster structure, so probing
the same number of lists recovers more of the exact top-k.
"""

import pytest


def _pairs(df):
    return {(r.query_id, r.nbr_id) for r in df.collect()}


@pytest.fixture(scope="module")
def recall(spark, sf_dir):
    from data_timeseries_java_spark.queries.similarity import (
        q_ann_ivf, q_ann_ivf_trained, q_knn_bruteforce)

    exact = _pairs(q_knn_bruteforce(spark, sf_dir))
    seed = _pairs(q_ann_ivf(spark, sf_dir))
    trained = _pairs(q_ann_ivf_trained(spark, sf_dir))
    return (len(seed & exact) / len(exact),
            len(trained & exact) / len(exact))


def test_trained_centroids_beat_seed_recall(recall):
    seed_recall, trained_recall = recall
    assert trained_recall > seed_recall, (
        f"k-means training did not improve recall@k: "
        f"seed={seed_recall:.3f} trained={trained_recall:.3f}")


def test_trained_recall_is_useful(recall):
    # approximate search with 3 of ~10 lists probed should still recover
    # a meaningful fraction of the exact neighbors
    _, trained_recall = recall
    assert trained_recall >= 0.5
