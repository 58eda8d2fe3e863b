"""Operator library: each module maps one family of reference operators
(SURVEY.md §2) onto DataFrame plans."""
