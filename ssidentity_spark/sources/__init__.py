"""Custom Spark data sources (the Spark 4 Python Data Source API)."""
