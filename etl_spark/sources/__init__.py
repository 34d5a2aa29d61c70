"""Sources: partitioned snapshot scans and change-stream readers."""
