"""Charts for benchmark/artifacts/all.csv (reference benchmark/muse_chart.py
uses plotly; plotly is unavailable here, so this delegates to the matplotlib
chart in muse_table.py)."""

from benchmark.muse_table import main as _table_main


def main(argv=None):
    return _table_main((argv or []) + ["--chart"])


if __name__ == "__main__":
    main()
