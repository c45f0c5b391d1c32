from .report import channel_report, report_metrics, report_totals

__all__ = ["channel_report", "report_metrics", "report_totals"]
