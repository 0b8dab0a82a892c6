"""DataFrame combinators re-expressing NiFi's operator inventory (SURVEY.md §2)."""
