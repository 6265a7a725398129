"""Entry-point shim preserving the reference analyzer CLI:
``python analyze_statistical_results.py --input results.csv --output report.md``
(reference analyze_statistical_results.py:30-36)."""

from multimodal_embedding_tpu.cli.analyze import main

if __name__ == "__main__":
    raise SystemExit(main())
