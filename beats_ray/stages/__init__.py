"""Cross-row pipeline stages (operators that span records): multiline
join, line-stream explode."""
