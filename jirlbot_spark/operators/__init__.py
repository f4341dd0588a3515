"""Crawl dataflow operators: DRUM-analog URL-seen dedup, STAR reputation
budgeting, BEAST enforcement, robots filtering, politeness scheduling,
fetch/parse, plus the training-data-pipeline suite (text dedup families,
ANN similarity, text analysis)."""
