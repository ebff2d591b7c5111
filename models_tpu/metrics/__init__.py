from .base import AUC, BinaryAccuracy, LogLoss, MAE, MeanMetric, Metric, Precision, RMSE, Recall
from .topk import (
    AvgPrecisionAt,
    MRRAt,
    NDCGAt,
    PrecisionAt,
    RecallAt,
    TopKMetric,
    TopKMetricsAggregator,
    extract_topk,
)
from .evaluation import ItemCoverageAt, NoveltyAt, PopularityBiasAt
