"""Engine operators (SURVEY.md §2): spatial joins (range, PIP, kNN), tile
assignment, density aggregation, segment forming, dedup / similarity /
text-analysis pipeline ops."""
