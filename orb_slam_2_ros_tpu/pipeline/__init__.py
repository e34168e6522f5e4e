"""Host pipeline: the reference's three pthreads as a software-pipelined
orchestration of jitted device steps (SURVEY.md §2.D)."""
