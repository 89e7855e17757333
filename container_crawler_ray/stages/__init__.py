"""map_batches / map_groups stage implementations for the crawl pipeline."""
