"""Sources: file scans, distributed Excel, managed lakehouse tables."""
