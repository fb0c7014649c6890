"""Sources: synthetic seed/fetch generators, WET-record parsing."""
