"""Engine-level operators that Spark lacks natively (SURVEY.md §2.2):
sharded Bloom URL-seen pre-filter, frontier admission windows."""
