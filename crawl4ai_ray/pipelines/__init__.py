"""Pipelines: the crawl engine epoch loop and the dataset query library."""
