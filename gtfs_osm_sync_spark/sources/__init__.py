"""Sources & sinks: snapshot tables, GTFS CSV readers, report/OsmChange sinks."""
