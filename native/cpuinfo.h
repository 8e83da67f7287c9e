// Affinity-aware CPU count shared by the native helpers.
// hardware_concurrency ignores cgroup/affinity limits; on a quota'd box it
// reports the host's cores and oversubscription thrashes one CPU.
#pragma once

#include <sched.h>
#include <thread>

inline unsigned gatv2_usable_cpus() {
  cpu_set_t set;
  if (sched_getaffinity(0, sizeof(set), &set) == 0) {
    int n = CPU_COUNT(&set);
    if (n > 0) return static_cast<unsigned>(n);
  }
  unsigned hw = std::thread::hardware_concurrency();
  return hw ? hw : 4;
}
