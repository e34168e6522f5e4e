"""Per-frame front end: ORB extraction, frame building, data association."""
