"""Named report-driver configs: Facebook-Marketing insights and
Google-Play bucket reports as thin instantiations of
:class:`~jitsu_spark.sources.ga_driver.GaShapedReportDriver`.

The reference ships these as distinct drivers; both are day/month
interval report pulls over an HTTP/GCS transport, i.e. exactly the
GA-shaped pull loop with different dimension/metric sets (semantics
re-derived from the reference, no code ported):

- Facebook Marketing (/root/reference/server/drivers/facebook_marketing.go):
  ``account_id`` is REQUIRED (facebook_marketing.go:56,62), reports hit
  ``/act_<account_id>/insights`` with a configured ``fields`` list
  (facebook_marketing.go:51,142), intervals are DAYs
  (facebook_marketing.go:107-118) with the standard trailing-lag
  signature. Here ``account_id`` becomes a constant column folded into
  the report-row id, ``fields`` split into dimensions vs money metrics.
- Google Play (/root/reference/server/drivers/google_play.go): sales /
  earnings CSV bundles live in a per-account GCS bucket
  (``pubsite_prod_rev_<account_id>``, google_play.go:21,103), one file
  per MONTH (intervalLayout "200601", google_play.go:27,139). Here the
  bucket is a parquet path, the month enumeration is
  ``granularity="MONTH"``, and the money casts mirror
  ``earningsTypeCasts`` (google_play.go:38) via ``sum_money``.

The sandbox has no network; the transport stub is the same parquet-backed
event store the GA driver uses. Everything downstream — interval
enumeration, lag signatures, chunked overwrite commits, concurrent
worker-pool sync — is the shared interval_sync machinery.
"""

from __future__ import annotations

from jitsu_spark.sources.ga_driver import GaShapedReportDriver


def facebook_marketing_insights_driver(
    source_path: str,
    account_id: str,
    now: str,
    dimensions: list[str] | None = None,
    money_fields: list[str] | None = None,
    ts_col: str = "ts",
    days_back: int = 30,
    attribution_lag_days: int = 7,
    arrival_col: str | None = None,
) -> GaShapedReportDriver:
    """FB-Marketing insights-collection shape: day intervals, required
    account id, insights ``fields`` = dimensions + money metrics
    (impressions count plus a DECIMAL-exact sum per money field).

    ``attribution_lag_days`` plays the trailing-lag role: conversions
    attribute back up to the attribution window, so recent days keep a
    moving signature and re-sync until the window passes."""
    if not account_id:
        raise ValueError("account_id is required")  # facebook_marketing.go:62
    dims = list(dimensions or ["campaign_id", "ad_id"])
    metrics: dict[str, tuple[str, str]] = {"impressions": ("count", "")}
    for fld in money_fields or ["spend"]:
        metrics[fld] = ("sum_money", fld)
    return GaShapedReportDriver(
        source_path=source_path,
        ts_col=ts_col,
        dimensions=dims,
        metrics=metrics,
        now=now,
        days_back=days_back,
        lag_days=attribution_lag_days,
        arrival_col=arrival_col,
        granularity="DAY",
        constants={"account_id": account_id},
    )


def google_play_driver(
    source_path: str,
    account_id: str,
    now: str,
    collection: str = "sales",
    ts_col: str = "ts",
    months_back: int = 12,
    lag_days: int = 3,
    arrival_col: str | None = None,
) -> GaShapedReportDriver:
    """Google-Play bucket-report shape: MONTH intervals (one sales /
    earnings bundle per month in the account bucket), money amounts
    DECIMAL-cast like ``earningsTypeCasts``. The current month's bundle
    keeps changing, so its signature moves until ``lag_days`` past the
    month boundary — the same freeze rule as the day drivers."""
    if not account_id:
        raise ValueError("account_id is required")
    if collection == "sales":
        dims = ["product_id", "country"]
        metrics: dict[str, tuple[str, str]] = {
            "units": ("sum_long", "units"),
            "charged_amount": ("sum_money", "amount"),
        }
    elif collection == "earnings":
        dims = ["product_id", "currency"]
        metrics = {"amount": ("sum_money", "amount")}
    else:  # google_play.go:23-24: sales | earnings only
        raise ValueError(
            f"unknown collection {collection!r}: only sales/earnings"
        )
    return GaShapedReportDriver(
        source_path=source_path,
        ts_col=ts_col,
        dimensions=dims,
        metrics=metrics,
        now=now,
        months_back=months_back,
        lag_days=lag_days,
        arrival_col=arrival_col,
        granularity="MONTH",
        constants={"account_id": account_id},
    )
