// FIFO velocity bridge: controller -> actuator handoff through a POSIX FIFO
// of binary Vel{x, y, r} structs, with the clamping / minimum-speed shaping
// the actuator side applies (the g1_move pair:
// reference nav_agent/sem_nav_ctr/src/g1_move/src/getvel.cpp:38-80 writes
// /tmp/vel_fifo; pubvel.cpp:41-95 reads, shapes, and drives the SDK —
// here the SDK call is the caller's responsibility via the read API).
#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

#include <algorithm>
#include <cerrno>
#include <cmath>
#include <cstring>

namespace holoagent {

struct Vel {
  float x, y, r;
};

extern "C" {

int velbridge_create(const char* path) {
  if (mkfifo(path, 0666) != 0 && errno != EEXIST) return -1;
  return 0;
}

int velbridge_open_writer(const char* path) {
  return open(path, O_WRONLY | O_NONBLOCK);
}

int velbridge_open_reader(const char* path) {
  return open(path, O_RDONLY | O_NONBLOCK);
}

int velbridge_write(int fd, float x, float y, float r) {
  Vel v{x, y, r};
  ssize_t w = write(fd, &v, sizeof(v));
  return w == sizeof(v) ? 0 : -1;
}

// Read the newest velocity command; applies clamping to [-vmax, vmax] and
// minimum-speed shaping (commands below vmin snap to 0 — dead-band — unless
// boost_small is set, in which case they snap up to vmin, the pubvel
// min-speed behavior). Returns 1 on fresh data, 0 when empty, -1 on error.
int velbridge_read_shaped(int fd, float vmax, float vmin, int boost_small,
                          float out[3]) {
  Vel v{};
  ssize_t n = -1;
  // drain to the newest struct
  Vel latest{};
  bool got = false;
  while ((n = read(fd, &v, sizeof(v))) == sizeof(v)) {
    latest = v;
    got = true;
  }
  if (!got) return (n < 0 && errno != EAGAIN) ? -1 : 0;
  float vals[3] = {latest.x, latest.y, latest.r};
  for (int i = 0; i < 3; ++i) {
    float a = std::clamp(vals[i], -vmax, vmax);
    if (std::fabs(a) < vmin) {
      a = boost_small && std::fabs(a) > 1e-6f ? std::copysign(vmin, a) : 0.0f;
    }
    out[i] = a;
  }
  return 1;
}

int velbridge_close(int fd) { return close(fd); }

}  // extern "C"

}  // namespace holoagent
