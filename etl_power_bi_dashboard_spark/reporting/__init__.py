from .charts import build_dashboard, render_bar_chart

__all__ = ["build_dashboard", "render_bar_chart"]
