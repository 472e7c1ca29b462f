// ORCA (Optimal Reciprocal Collision Avoidance) simulator.
//
// Native replacement for the reference's Python-RVO2 dependency
// (/root/reference/trajnetbaselines/classical/orca.py:4,90 uses
// rvo2.PyRVOSimulator).  Implements the ORCA algorithm of van den Berg,
// Guy, Lin & Manocha ("Reciprocal n-body collision avoidance", ISRR 2009)
// from the published formulation: per agent, each neighbour induces a
// half-plane constraint on velocity space (derived from the truncated
// velocity-obstacle cone, split reciprocally); the new velocity is the
// point closest to the preferred velocity satisfying all constraints,
// found by incremental 2D linear programming with a 3rd "least-penetration"
// program when constraints are infeasible.
//
// Exposed through a minimal C ABI for ctypes; no obstacle support (the
// reference never adds obstacles).

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <limits>
#include <utility>
#include <vector>

namespace {

constexpr float kEpsilon = 1e-5f;

struct Vec2 {
  float x = 0.f, y = 0.f;
};

inline Vec2 operator+(Vec2 a, Vec2 b) { return {a.x + b.x, a.y + b.y}; }
inline Vec2 operator-(Vec2 a, Vec2 b) { return {a.x - b.x, a.y - b.y}; }
inline Vec2 operator*(float s, Vec2 a) { return {s * a.x, s * a.y}; }
inline float dot(Vec2 a, Vec2 b) { return a.x * b.x + a.y * b.y; }
inline float det(Vec2 a, Vec2 b) { return a.x * b.y - a.y * b.x; }
inline float abs_sq(Vec2 a) { return dot(a, a); }
inline float length(Vec2 a) { return std::sqrt(abs_sq(a)); }
inline Vec2 normalized(Vec2 a) {
  float len = length(a);
  return len > 0.f ? (1.f / len) * a : Vec2{0.f, 0.f};
}

struct Line {
  Vec2 point;
  Vec2 direction;
};

struct Agent {
  Vec2 position;
  Vec2 velocity;
  Vec2 pref_velocity;
  Vec2 new_velocity;
  float max_speed = 1.5f;
};

// Solve on the boundary of constraint `line_no`, restricted to the speed
// circle and the feasible sides of lines[0..line_no).
bool linear_program1(const std::vector<Line>& lines, size_t line_no, float radius,
                     Vec2 opt_velocity, bool direction_opt, Vec2* result) {
  const Line& ln = lines[line_no];
  const float dot_product = dot(ln.point, ln.direction);
  const float discriminant =
      dot_product * dot_product + radius * radius - abs_sq(ln.point);
  if (discriminant < 0.f) return false;  // speed circle misses this line

  const float sqrt_disc = std::sqrt(discriminant);
  float t_left = -dot_product - sqrt_disc;
  float t_right = -dot_product + sqrt_disc;

  for (size_t i = 0; i < line_no; ++i) {
    const float denominator = det(ln.direction, lines[i].direction);
    const float numerator = det(lines[i].direction, ln.point - lines[i].point);
    if (std::fabs(denominator) <= kEpsilon) {
      if (numerator < 0.f) return false;  // parallel and fully infeasible
      continue;
    }
    const float t = numerator / denominator;
    if (denominator >= 0.f) {
      t_right = std::min(t_right, t);
    } else {
      t_left = std::max(t_left, t);
    }
    if (t_left > t_right) return false;
  }

  if (direction_opt) {
    // optimize direction: take the extreme point in opt_velocity direction
    if (dot(opt_velocity, ln.direction) > 0.f) {
      *result = ln.point + t_right * ln.direction;
    } else {
      *result = ln.point + t_left * ln.direction;
    }
  } else {
    const float t = dot(ln.direction, opt_velocity - ln.point);
    *result = ln.point + std::clamp(t, t_left, t_right) * ln.direction;
  }
  return true;
}

// Incremental 2D LP over half-planes; returns index of first failing line
// (== lines.size() on success).
size_t linear_program2(const std::vector<Line>& lines, float radius,
                       Vec2 opt_velocity, bool direction_opt, Vec2* result) {
  if (direction_opt) {
    *result = radius * opt_velocity;  // opt_velocity is a unit direction
  } else if (abs_sq(opt_velocity) > radius * radius) {
    *result = radius * normalized(opt_velocity);
  } else {
    *result = opt_velocity;
  }

  for (size_t i = 0; i < lines.size(); ++i) {
    if (det(lines[i].direction, lines[i].point - *result) > 0.f) {
      const Vec2 temp = *result;
      if (!linear_program1(lines, i, radius, opt_velocity, direction_opt, result)) {
        *result = temp;
        return i;
      }
    }
  }
  return lines.size();
}

// Least-penetration fallback when the half-planes are infeasible.
void linear_program3(const std::vector<Line>& lines, size_t begin_line,
                     float radius, Vec2* result) {
  float distance = 0.f;
  for (size_t i = begin_line; i < lines.size(); ++i) {
    if (det(lines[i].direction, lines[i].point - *result) <= distance) continue;

    std::vector<Line> proj_lines;
    for (size_t j = 0; j < i; ++j) {
      Line new_line;
      const float determinant = det(lines[i].direction, lines[j].direction);
      if (std::fabs(determinant) <= kEpsilon) {
        if (dot(lines[i].direction, lines[j].direction) > 0.f) continue;
        new_line.point = 0.5f * (lines[i].point + lines[j].point);
      } else {
        new_line.point =
            lines[i].point +
            (det(lines[j].direction, lines[i].point - lines[j].point) /
             determinant) *
                lines[i].direction;
      }
      new_line.direction = normalized(lines[j].direction - lines[i].direction);
      proj_lines.push_back(new_line);
    }

    const Vec2 temp = *result;
    if (linear_program2(proj_lines, radius,
                        Vec2{-lines[i].direction.y, lines[i].direction.x}, true,
                        result) < proj_lines.size()) {
      *result = temp;  // should not happen by construction
    }
    distance = det(lines[i].direction, lines[i].point - *result);
  }
}

class Simulator {
 public:
  Simulator(float time_step, float neighbor_dist, int max_neighbors,
            float time_horizon, float radius, float max_speed)
      : time_step_(time_step),
        neighbor_dist_(neighbor_dist),
        max_neighbors_(max_neighbors),
        time_horizon_(time_horizon),
        radius_(radius),
        default_max_speed_(max_speed) {}

  int add_agent(float x, float y, float vx, float vy, float max_speed) {
    Agent a;
    a.position = {x, y};
    a.velocity = {vx, vy};
    a.max_speed = max_speed > 0.f ? max_speed : default_max_speed_;
    agents_.push_back(a);
    return static_cast<int>(agents_.size()) - 1;
  }

  void set_pref_velocity(int i, float vx, float vy) {
    agents_[i].pref_velocity = {vx, vy};
  }

  void do_step() {
    const float inv_time_horizon = 1.f / time_horizon_;
    const float inv_time_step = 1.f / time_step_;

    for (size_t i = 0; i < agents_.size(); ++i) {
      Agent& self = agents_[i];

      // nearest neighbours within neighbor_dist (up to max_neighbors)
      std::vector<std::pair<float, size_t>> nearby;
      for (size_t j = 0; j < agents_.size(); ++j) {
        if (j == i) continue;
        const float d2 = abs_sq(agents_[j].position - self.position);
        if (d2 < neighbor_dist_ * neighbor_dist_) nearby.emplace_back(d2, j);
      }
      std::sort(nearby.begin(), nearby.end());
      if (static_cast<int>(nearby.size()) > max_neighbors_) {
        nearby.resize(max_neighbors_);
      }

      std::vector<Line> lines;
      for (const auto& [d2, j] : nearby) {
        const Agent& other = agents_[j];
        const Vec2 relative_position = other.position - self.position;
        const Vec2 relative_velocity = self.velocity - other.velocity;
        const float dist_sq = abs_sq(relative_position);
        const float combined_radius = radius_ + radius_;
        const float combined_radius_sq = combined_radius * combined_radius;

        Line line;
        Vec2 u;

        if (dist_sq > combined_radius_sq) {
          // no current collision: constraint from the truncated VO cone
          const Vec2 w =
              relative_velocity - inv_time_horizon * relative_position;
          const float w_length_sq = abs_sq(w);
          const float dot_product1 = dot(w, relative_position);

          if (dot_product1 < 0.f &&
              dot_product1 * dot_product1 > combined_radius_sq * w_length_sq) {
            // project on the cut-off circle
            const float w_length = std::sqrt(w_length_sq);
            const Vec2 unit_w = (1.f / w_length) * w;
            line.direction = {unit_w.y, -unit_w.x};
            u = (combined_radius * inv_time_horizon - w_length) * unit_w;
          } else {
            // project on the nearer cone leg
            const float leg = std::sqrt(dist_sq - combined_radius_sq);
            if (det(relative_position, w) > 0.f) {
              line.direction = (1.f / dist_sq) *
                               Vec2{relative_position.x * leg -
                                        relative_position.y * combined_radius,
                                    relative_position.x * combined_radius +
                                        relative_position.y * leg};
            } else {
              line.direction = (-1.f / dist_sq) *
                               Vec2{relative_position.x * leg +
                                        relative_position.y * combined_radius,
                                    -relative_position.x * combined_radius +
                                        relative_position.y * leg};
            }
            u = dot(relative_velocity, line.direction) * line.direction -
                relative_velocity;
          }
        } else {
          // already colliding: push apart within one time step
          const Vec2 w =
              relative_velocity - inv_time_step * relative_position;
          const float w_length = length(w);
          const Vec2 unit_w =
              w_length > 0.f ? (1.f / w_length) * w : Vec2{1.f, 0.f};
          line.direction = {unit_w.y, -unit_w.x};
          u = (combined_radius * inv_time_step - w_length) * unit_w;
        }

        // reciprocity: each agent takes half the responsibility
        line.point = self.velocity + 0.5f * u;
        lines.push_back(line);
      }

      Vec2 result;
      const size_t fail =
          linear_program2(lines, self.max_speed, self.pref_velocity, false, &result);
      if (fail < lines.size()) {
        linear_program3(lines, fail, self.max_speed, &result);
      }
      self.new_velocity = result;
    }

    for (Agent& a : agents_) {
      a.velocity = a.new_velocity;
      a.position = a.position + time_step_ * a.velocity;
    }
  }

  Vec2 position(int i) const { return agents_[i].position; }
  Vec2 velocity(int i) const { return agents_[i].velocity; }
  int size() const { return static_cast<int>(agents_.size()); }

 private:
  float time_step_;
  float neighbor_dist_;
  int max_neighbors_;
  float time_horizon_;
  float radius_;
  float default_max_speed_;
  std::vector<Agent> agents_;
};

}  // namespace

extern "C" {

void* orca_create(float time_step, float neighbor_dist, int max_neighbors,
                  float time_horizon, float radius, float max_speed) {
  return new Simulator(time_step, neighbor_dist, max_neighbors, time_horizon,
                       radius, max_speed);
}

void orca_destroy(void* sim) { delete static_cast<Simulator*>(sim); }

int orca_add_agent(void* sim, float x, float y, float vx, float vy,
                   float max_speed) {
  return static_cast<Simulator*>(sim)->add_agent(x, y, vx, vy, max_speed);
}

void orca_set_pref_velocity(void* sim, int i, float vx, float vy) {
  static_cast<Simulator*>(sim)->set_pref_velocity(i, vx, vy);
}

void orca_do_step(void* sim) { static_cast<Simulator*>(sim)->do_step(); }

void orca_get_position(void* sim, int i, float* x, float* y) {
  const auto p = static_cast<Simulator*>(sim)->position(i);
  *x = p.x;
  *y = p.y;
}

void orca_get_velocity(void* sim, int i, float* vx, float* vy) {
  const auto v = static_cast<Simulator*>(sim)->velocity(i);
  *vx = v.x;
  *vy = v.y;
}

int orca_num_agents(void* sim) {
  return static_cast<Simulator*>(sim)->size();
}

}  // extern "C"
