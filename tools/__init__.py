"""Command-line tools (each also importable, e.g.
``from tools import export_generator``): parity_day (asset-day
protocol), bench_large (link-independent large-image timing),
profile_ablation (per-component MFU attribution), make_assets
(full-size byte-format-exact datasets), export_generator (StableHLO
serving artifact)."""
