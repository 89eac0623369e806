"""Streaming: Structured Streaming ingestion + query subscriptions
(NSDb's WebSocket/gRPC pub-sub re-expressed, SURVEY.md §2.8)."""
from .subscribe import SubscriptionManager  # noqa: F401
from .ingest import start_parquet_ingestion, stream_filter, stream_temporal_agg  # noqa: F401
from .neardup import start_neardup_alerts  # noqa: F401
from .anomaly import fit_seasonal_baseline, start_seasonal_anomaly_alerts  # noqa: F401
