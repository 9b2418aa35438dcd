from .figures import (  # noqa: F401
    render_bar_chart,
    render_line_chart,
    render_pie_chart,
    render_scatter_chart,
    save_bar_chart_png,
    save_chart_png,
    save_panel_grid_png,
    save_reference_figures,
    write_png,
)
