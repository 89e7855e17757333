"""Pipelines: the crawl driver loop and the training-data operators."""
