"""Cross-cutting utilities: perf counters, memoization, i18n."""
