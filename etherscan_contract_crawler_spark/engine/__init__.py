"""Engine: the epoch-batched crawl loop (schedule -> fetch -> validate -> commit)."""
