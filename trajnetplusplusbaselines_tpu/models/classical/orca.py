"""ORCA predictor: ctypes bindings over the native C++ simulator.

Behavioural mirror of /root/reference/trajnetbaselines/classical/orca.py:10-134,
with the Python-RVO2 (C++/Cython) dependency replaced by this framework's own
native ORCA implementation (native/orca.cpp), compiled on first use.

Parameters follow the reference: PyRVOSimulator(1/fps, neighborDist,
maxNeighbors=10, timeHorizon, timeHorizonObst=5 (unused, no obstacles),
radius, maxSpeed=1.5); agents join with maxSpeed = 1.3 x initial speed;
pref velocity steers toward the goal each substep, zero within 0.05 m.
"""

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

MAX_SPEED_MULTIPLIER = 1.3

_LIB = None


def _native_dir():
    return os.path.join(os.path.dirname(__file__), "..", "..", "..", "native")


def _load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    native_dir = os.path.abspath(_native_dir())
    src = os.path.join(native_dir, "orca.cpp")
    lib_path = os.path.join(native_dir, "liborca.so")

    if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", lib_path],
            check=True,
        )

    lib = ctypes.CDLL(lib_path)
    lib.orca_create.restype = ctypes.c_void_p
    lib.orca_create.argtypes = [ctypes.c_float, ctypes.c_float, ctypes.c_int,
                                ctypes.c_float, ctypes.c_float, ctypes.c_float]
    lib.orca_destroy.argtypes = [ctypes.c_void_p]
    lib.orca_add_agent.restype = ctypes.c_int
    lib.orca_add_agent.argtypes = [ctypes.c_void_p] + [ctypes.c_float] * 5
    lib.orca_set_pref_velocity.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           ctypes.c_float, ctypes.c_float]
    lib.orca_do_step.argtypes = [ctypes.c_void_p]
    lib.orca_get_position.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return lib


class OrcaSimulator:
    """Thin object wrapper over the C ABI (RVO2-like surface)."""

    def __init__(self, time_step, neighbor_dist=1.5, max_neighbors=10,
                 time_horizon=1.5, radius=0.4, max_speed=1.5):
        self._lib = _load_library()
        self._sim = self._lib.orca_create(
            time_step, neighbor_dist, max_neighbors, time_horizon, radius, max_speed
        )

    def __del__(self):
        if getattr(self, "_sim", None):
            self._lib.orca_destroy(self._sim)
            self._sim = None

    def add_agent(self, position, velocity=(0.0, 0.0), max_speed=0.0) -> int:
        return self._lib.orca_add_agent(
            self._sim, position[0], position[1], velocity[0], velocity[1], max_speed
        )

    def set_agent_pref_velocity(self, i, velocity) -> None:
        self._lib.orca_set_pref_velocity(self._sim, i, velocity[0], velocity[1])

    def do_step(self) -> None:
        self._lib.orca_do_step(self._sim)

    def get_agent_position(self, i):
        x, y = ctypes.c_float(), ctypes.c_float()
        self._lib.orca_get_position(self._sim, i, ctypes.byref(x), ctypes.byref(y))
        return x.value, y.value


def _dest_by_interpolation(xs, ys, pred_length):
    if len(xs) == 1:
        return [xs[-1], ys[-1]]
    return [xs[-1] + (xs[-1] - xs[-2]) * pred_length,
            ys[-1] + (ys[-1] - ys[-2]) * pred_length]


def predict(input_paths, dest_dict=None, dest_type="interp", orca_params=(1.5, 1.5, 0.4),
            predict_all=True, n_predict=12, obs_length=9):
    """Path-level API mirroring the reference's orca.predict."""
    pred_length = n_predict
    primary = input_paths[0]
    start_frame = primary[obs_length - 1].frame

    fps = 20
    sampling_rate = fps / 2.5
    neighbor_dist, time_horizon, radius = orca_params
    sim = OrcaSimulator(
        1.0 / fps, neighbor_dist=neighbor_dist, max_neighbors=10,
        time_horizon=time_horizon, radius=radius, max_speed=1.5,
    )

    positions, goals, speeds = [], [], []
    for path in input_paths:
        ped_id = path[0].pedestrian
        past = [t for t in path if t.frame <= start_frame]
        past_frames = [t.frame for t in path if t.frame <= start_frame]
        future = [t for t in path if t.frame > start_frame]
        if start_frame not in past_frames:
            continue
        curr = past[-1]

        if len(past) >= 4:
            stride, prev = 3, past[-4]
        else:
            stride, prev = len(past) - 1, past[-len(past)]
        if stride == 0:
            vel, speed = (0.0, 0.0), 0.0
        else:
            diff = np.array([curr.x - prev.x, curr.y - prev.y])
            theta = np.arctan2(diff[1], diff[0])
            speed = float(np.linalg.norm(diff) / (stride * 0.4))
            vel = (speed * np.cos(theta), speed * np.sin(theta))

        if dest_type == "true":
            if dest_dict is None:
                raise ValueError("dest_dict required for dest_type='true'")
            d_x, d_y = dest_dict[ped_id]
        elif dest_type == "interp":
            d_x, d_y = _dest_by_interpolation(
                [t.x for t in past], [t.y for t in past], pred_length
            )
        elif dest_type == "pred_end":
            d_x, d_y = future[-1].x, future[-1].y
        else:
            raise NotImplementedError(dest_type)

        positions.append((curr.x, curr.y))
        goals.append((d_x, d_y))
        speeds.append(speed)
        sim.add_agent((curr.x, curr.y), velocity=vel,
                      max_speed=MAX_SPEED_MULTIPLIER * speed)

    num_ped = len(speeds)
    trajectories = [[positions[i]] for i in range(num_ped)]
    count = 0
    end_range = 0.05
    while count < sampling_rate * pred_length + 1:
        count += 1
        sim.do_step()
        for i in range(num_ped):
            if count == 1:
                trajectories[i].pop(0)
            position = sim.get_agent_position(i)
            if count % sampling_rate == 0:
                trajectories[i].append(position)

            # steer toward the goal; stop within end_range
            to_goal = np.array(goals[i]) - np.array(position)
            dist = np.linalg.norm(to_goal)
            if dist < end_range:
                sim.set_agent_pref_velocity(i, (0.0, 0.0))
            else:
                pref = speeds[i] * to_goal / dist if dist > speeds[i] else to_goal
                sim.set_agent_pref_velocity(i, tuple(pref.tolist()))

    states = np.array(trajectories).transpose(1, 0, 2)
    primary_track = states[:, 0, 0:2]
    neighbours_tracks = states[:, 1:, 0:2]
    if not predict_all:
        neighbours_tracks = []
    return {0: (primary_track, neighbours_tracks)}
