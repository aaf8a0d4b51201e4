from fedrann_tpu.knn.topk import knn_exact, normalize_rows  # noqa: F401
