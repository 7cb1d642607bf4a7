"""Sources: synthetic Common-Crawl-style pages table + table catalog."""
