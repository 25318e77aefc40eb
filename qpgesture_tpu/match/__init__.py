from .database import (MatchDatabase, stage_database, stage_test_audio,
                       stage_test_context)
from .engine import CodeKNNEngine, build_device_tables
from .gesture_knn import GestureKNNData, GestureKNNEngine
from .oracle import CodeKNNOracle, OracleResult
from .control import create_control_filter

__all__ = ["MatchDatabase", "stage_database", "stage_test_audio",
           "stage_test_context", "CodeKNNEngine", "build_device_tables",
           "GestureKNNData", "GestureKNNEngine", "CodeKNNOracle",
           "OracleResult", "create_control_filter"]
